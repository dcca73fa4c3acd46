"""Metric-core tests.

Includes a differential test against the reference evaluator at
/root/reference/standalone_eval/eval.py (numpy-only, imported read-only with
a small np.bool shim) on randomized synthetic submissions — this pins exact
metric parity without any golden files.
"""
import sys
import types

import numpy as np
import pytest

from tvretrieval_tpu.evaluation.metrics import (
    eval_retrieval,
    eval_by_task_type,
    temporal_iou,
)

REFERENCE_EVAL_DIR = "/root/reference/standalone_eval"


def _load_reference_eval():
    """Import the reference evaluator module (read-only) with compat shims."""
    # old numpy aliases used by the 2020-era reference
    if not hasattr(np, "bool"):
        np.bool = bool  # type: ignore[attr-defined]
    if not hasattr(np, "int"):
        np.int = int  # type: ignore[attr-defined]
    # tqdm is available in this image; no shim needed for it
    sys.path.insert(0, REFERENCE_EVAL_DIR)
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "reference_eval", REFERENCE_EVAL_DIR + "/eval.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)


def _make_synthetic_case(rng, n_videos=30, n_desc=40, n_pred=25):
    video2idx = {f"vid_{i}": i for i in range(n_videos)}
    gt = []
    for qi in range(n_desc):
        vid = f"vid_{rng.integers(n_videos)}"
        st = float(rng.uniform(0, 80))
        ed = st + float(rng.uniform(1, 30))
        gt.append({
            "desc_id": 1000 + qi,
            "desc": f"query {qi}",
            "type": ["v", "t", "vt"][int(rng.integers(3))],
            "vid_name": vid,
            "ts": [st, ed],
        })

    def make_preds(task):
        rows = []
        for qi, g in enumerate(gt):
            preds = []
            for _ in range(n_pred):
                if task == "SVMR":
                    v = video2idx[g["vid_name"]]
                else:
                    v = int(rng.integers(n_videos))
                st = float(rng.uniform(0, 90))
                ed = st + float(rng.uniform(1, 30))
                preds.append([v, st, ed, float(rng.uniform())])
            # sometimes inject a true positive near the top
            if rng.uniform() < 0.5:
                pos = [video2idx[g["vid_name"]], g["ts"][0] + 0.3, g["ts"][1] - 0.2, 9.9]
                preds[int(rng.integers(5))] = pos
            rows.append({"desc_id": g["desc_id"], "desc": g["desc"], "predictions": preds})
        return rows

    submission = {
        "video2idx": video2idx,
        "VCMR": make_preds("VCMR"),
        "SVMR": make_preds("SVMR"),
        "VR": make_preds("VR"),
    }
    return submission, gt


def test_temporal_iou_basic():
    preds = np.array([[0.0, 10.0], [5.0, 15.0], [20.0, 30.0], [0.0, 0.0]])
    gt = np.array([0.0, 10.0])
    iou = temporal_iou(preds, gt)
    assert iou[0] == pytest.approx(1.0)
    assert iou[1] == pytest.approx(5.0 / 15.0)
    assert iou[2] == pytest.approx(0.0)
    # zero-union degenerate span
    assert iou[3] == pytest.approx(0.0)


def test_recall_simple_handcase():
    video2idx = {"a": 0, "b": 1}
    gt = [
        {"desc_id": 1, "desc": "x", "type": "v", "vid_name": "a", "ts": [0.0, 10.0]},
        {"desc_id": 2, "desc": "y", "type": "t", "vid_name": "b", "ts": [5.0, 15.0]},
    ]
    submission = {
        "video2idx": video2idx,
        "VCMR": [
            # query 1: rank-1 exact hit
            {"desc_id": 1, "desc": "x", "predictions": [[0, 0.0, 10.0, 1.0], [1, 0, 5, 0.5]]},
            # query 2: rank-2 hit (rank-1 wrong video)
            {"desc_id": 2, "desc": "y", "predictions": [[0, 5.0, 15.0, 1.0], [1, 5.0, 15.0, 0.5]]},
        ],
    }
    res = eval_retrieval(submission, gt)
    assert res["VCMR"]["0.7-r1"] == 50.0
    assert res["VCMR"]["0.7-r5"] == 100.0
    assert res["VCMR_by_type"]["v-0.7-r1"] == 100.0
    assert res["VCMR_by_type"]["t-0.7-r1"] == 0.0


def test_svmr_rank_restriction():
    """SVMR recall must rank only among predictions on the GT video."""
    video2idx = {"a": 0, "b": 1}
    gt = [{"desc_id": 1, "desc": "x", "type": "v", "vid_name": "a", "ts": [0.0, 10.0]}]
    # first 3 predictions are wrong-video; 4th (first *matched*) is correct
    submission = {
        "video2idx": video2idx,
        "SVMR": [{"desc_id": 1, "desc": "x", "predictions": [
            [1, 0.0, 10.0, 0.9],
            [1, 0.0, 10.0, 0.8],
            [1, 0.0, 10.0, 0.7],
            [0, 0.0, 10.0, 0.6],
        ]}],
    }
    res = eval_retrieval(submission, gt)
    # within matched predictions the hit is at rank 1
    assert res["SVMR"]["0.7-r1"] == 100.0


def test_differential_vs_reference_evaluator():
    """Exact parity with the reference evaluator on randomized submissions."""
    ref = _load_reference_eval()
    rng = np.random.default_rng(7)
    for trial in range(3):
        submission, gt = _make_synthetic_case(rng)
        ours = eval_retrieval(submission, gt, verbose=False)
        theirs = ref.eval_retrieval(submission, gt, verbose=False)
        for task in ["VCMR", "SVMR", "VR", "VCMR_by_type", "SVMR_by_type", "VR_by_type"]:
            assert task in ours and task in theirs
            for key, val in theirs[task].items():
                assert ours[task][key] == val, (
                    f"trial {trial} task {task} key {key}: ours={ours[task][key]} ref={val}")


def test_array_path_matches_dict_path():
    """eval_retrieval_arrays must equal eval_retrieval on the same data."""
    from tvretrieval_tpu.evaluation.metrics import eval_retrieval_arrays
    rng = np.random.default_rng(13)
    submission, gt = _make_synthetic_case(rng, n_videos=20, n_desc=30, n_pred=40)

    def to_arrays(task):
        entries = {e["desc_id"]: e for e in submission[task]}
        vid = np.stack([[p[0] for p in entries[g["desc_id"]]["predictions"]]
                        for g in gt]).astype(np.int64)
        spans = np.stack([[p[1:3] for p in entries[g["desc_id"]]["predictions"]]
                          for g in gt]).astype(np.float32)
        return vid, spans

    vcmr = to_arrays("VCMR")
    svmr = to_arrays("SVMR")
    vr = to_arrays("VR")[0]
    ours = eval_retrieval_arrays(gt, submission["video2idx"],
                                 vcmr=vcmr, svmr=svmr, vr=vr)
    ref = eval_retrieval(submission, gt)
    for task in ("VCMR", "SVMR", "VR", "VCMR_by_type", "SVMR_by_type", "VR_by_type"):
        assert dict(ours[task]) == dict(ref[task]), task


def test_differential_didemo_multi_ts():
    """Multi-annotation (DiDeMo) branch parity: >=2 overlaps required."""
    ref = _load_reference_eval()
    rng = np.random.default_rng(3)
    video2idx = {f"v{i}": i for i in range(5)}
    gt = []
    for qi in range(10):
        gt.append({
            "desc_id": qi,
            "desc": "d",
            "type": "v",
            "vid_name": f"v{rng.integers(5)}",
            "ts": [[float(s), float(s) + 5.0] for s in rng.uniform(0, 30, size=4)],
        })
    preds = []
    for g in gt:
        rows = [[int(rng.integers(5)), float(rng.uniform(0, 30)), float(rng.uniform(5, 40)), 1.0]
                for _ in range(15)]
        preds.append({"desc_id": g["desc_id"], "desc": "d", "predictions": rows})
    submission = {"video2idx": video2idx, "VCMR": preds}
    ours = eval_retrieval(submission, gt, use_desc_type=False)
    theirs = ref.eval_retrieval(submission, gt, use_desc_type=False, verbose=False)
    assert dict(ours["VCMR"]) == dict(theirs["VCMR"])

"""Differential test: evaluation/fusion.py vs the reference late-fusion
re-ranker (clip_alignment_with_language/mix_model_prediction.py:35-86) on
synthetic prediction files — exact rank/score-merge parity.
"""
from __future__ import annotations

import importlib.util
import json
import sys

import numpy as np
import pytest

from tvretrieval_tpu.evaluation.fusion import mix_predictions

REFERENCE_MIX = ("/root/reference/baselines/clip_alignment_with_language/"
                 "mix_model_prediction.py")


def _load_reference_mix():
    """Import the reference mixer (read-only); it only needs load/save_json
    from utils.basic_utils plus torch/tqdm, all present in-env."""
    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location("reference_mix",
                                                      REFERENCE_MIX)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)


def _synthetic_submissions(rng, n_queries=20, top_a=200, top_b=1000,
                           n_videos=50):
    """Two prediction files over a shared moment vocabulary: file A's top
    moments partially overlap file B's ranking (the re-rank source)."""
    def entry(desc_id, n_preds, seed_shift):
        r = np.random.default_rng(rng.integers(1 << 31) + seed_shift)
        preds = []
        seen = set()
        while len(preds) < n_preds:
            vid = int(r.integers(n_videos))
            st = float(r.integers(0, 20) * 1.5)
            ed = st + float(r.integers(1, 10) * 1.5)
            if (vid, st, ed) in seen:
                continue
            seen.add((vid, st, ed))
            preds.append([vid, st, ed, float(r.random())])
        return {"desc_id": desc_id, "desc": f"q{desc_id}",
                "predictions": preds}

    video2idx = {f"v{i}": i for i in range(n_videos)}
    a = {"VCMR": [entry(i, top_a, 0) for i in range(n_queries)],
         "video2idx": video2idx}
    b = {"VCMR": [entry(i, top_b, 7) for i in range(n_queries)],
         "video2idx": video2idx}
    return a, b


@pytest.mark.parametrize("top_a,top_b", [(200, 1000), (30, 40)])
def test_mix_matches_reference(tmp_path, top_a, top_b):
    """Exact output parity with main_mix_results, including the
    pad-by-repetition when fewer than max_after_nms moments survive
    (mix_model_prediction.py:55-58) and the sparse-overlap case where the
    single pad does NOT reach max_after_nms."""
    rng = np.random.default_rng(0)
    a, b = _synthetic_submissions(rng, top_a=top_a, top_b=top_b)

    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))

    ref = _load_reference_mix()
    ref_out_path = tmp_path / "ref_out.json"
    ref.main_mix_results(str(pa), str(pb), str(ref_out_path))
    ref_out = json.loads(ref_out_path.read_text())

    out_path = tmp_path / "out.json"
    out = mix_predictions(str(pa), str(pb), str(out_path))

    assert out["video2idx"] == ref_out["video2idx"]
    ours = {e["desc_id"]: e for e in out["VCMR"]}
    theirs = {e["desc_id"]: e for e in ref_out["VCMR"]}
    assert set(ours) == set(theirs)
    for desc_id, mine in ours.items():
        ref_e = theirs[desc_id]
        assert mine["desc"] == ref_e["desc"]
        assert mine["predictions"] == ref_e["predictions"], desc_id
    # the saved file round-trips identically
    assert json.loads(out_path.read_text())["VCMR"] == out["VCMR"]


def test_mix_cli_with_metrics(tmp_path):
    """The CLI entry point writes the mixed submission and (with --gt_path)
    a metrics JSON, mirroring the reference's subprocess eval step."""
    from tvretrieval_tpu.evaluation.fusion import main

    rng = np.random.default_rng(1)
    a, b = _synthetic_submissions(rng, n_queries=8, top_a=50, top_b=80)
    gt_rows = []
    for i in range(8):
        p = a["VCMR"][i]["predictions"][0]
        vid_name = f"v{p[0]}"
        gt_rows.append({"desc_id": i, "desc": f"q{i}", "vid_name": vid_name,
                        "ts": [p[1], p[2]], "duration": 100.0,
                        "type": "v"})
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    gt = tmp_path / "gt.jsonl"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    gt.write_text("\n".join(json.dumps(r) for r in gt_rows))

    save = tmp_path / "mixed.json"
    main(["--pred_path", str(pa), "--rerank_pred_path", str(pb),
          "--save_path", str(save), "--gt_path", str(gt)])
    assert save.exists()
    metrics = json.loads((tmp_path / "mixed_metrics.json").read_text())
    assert "VCMR" in metrics

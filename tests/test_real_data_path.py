"""Real-data integration path: HDF5 feature files + real TVR annotation
formats (subset of /root/reference/data) through the full training driver.

Features are synthetic (the 33GB release isn't in this environment) but the
storage layout, key conventions, and CLI wiring are exactly the release's.
"""
import json
import os

import numpy as np
import pytest

REF_DATA = "/root/reference/data"


@pytest.mark.skipif(not os.path.exists(f"{REF_DATA}/tvr_val_release.jsonl"),
                    reason="reference data not mounted")
def test_train_xml_on_h5_with_real_annotations(tmp_path, rng):
    import h5py
    from tvretrieval_tpu.utils.io import load_json, load_jsonl, save_json, save_jsonl

    rows = load_jsonl(f"{REF_DATA}/tvr_val_release.jsonl")[:48]
    vid2dur = load_json(f"{REF_DATA}/tvr_video2dur_idx.json")["val"]
    vid_names = sorted({r["vid_name"] for r in rows})

    # subset corpus index in the release format {split: {vid: [dur, idx]}}
    sub_index = {"val": {v: vid2dur[v] for v in vid_names}}
    idx_path = str(tmp_path / "video2dur_idx.json")
    save_json(sub_index, idx_path)

    # synthetic features in the release's h5 layout
    vid_dim, sub_dim, q_dim = 32, 24, 20
    with h5py.File(tmp_path / "vid_feat.h5", "w") as h5:
        for v in vid_names:
            n_clips = min(int(vid2dur[v][0] // 1.5) + 1, 100)
            h5.create_dataset(v, data=rng.normal(
                size=(n_clips, vid_dim)).astype(np.float32))
    with h5py.File(tmp_path / "sub_feat.h5", "w") as h5:
        for v in vid_names:
            n_clips = min(int(vid2dur[v][0] // 1.5) + 1, 100)
            h5.create_dataset(v, data=rng.normal(
                size=(n_clips, sub_dim)).astype(np.float32))
    with h5py.File(tmp_path / "desc_feat.h5", "w") as h5:
        for r in rows:
            n_tok = min(len(r["desc"].split()) + 2, 30)
            h5.create_dataset(str(r["desc_id"]), data=rng.normal(
                size=(n_tok, q_dim)).astype(np.float32))

    train_path = str(tmp_path / "train.jsonl")
    save_jsonl(rows, train_path)

    from tvretrieval_tpu.training.train_xml import start_training
    out = start_training([
        "--exp_id", "h5t", "--results_root", str(tmp_path),
        "--train_path", train_path, "--eval_path", train_path,
        "--desc_bert_path", str(tmp_path / "desc_feat.h5"),
        "--sub_bert_path", str(tmp_path / "sub_feat.h5"),
        "--vid_feat_path", str(tmp_path / "vid_feat.h5"),
        "--video_duration_idx_path", idx_path,
        "--ctx_mode", "video_sub_tef", "--h5_preload",
        "--n_epoch", "1", "--bsz", "16", "--hidden_size", "32",
        "--eval_query_bsz", "16", "--eval_context_bsz", "16",
        "--max_vcmr_video", "10", "--max_es_cnt", "1",
    ])
    m = out["final_metrics"]
    assert m is not None and "VCMR" in m and "SVMR" in m and "VR" in m
    # real desc_ids survived the whole pipeline into the submission
    sub = load_json(os.path.join(out["results_dir"], "best_predictions.json"))
    pred_ids = {e["desc_id"] for e in sub["VCMR"]}
    assert pred_ids == {r["desc_id"] for r in rows}


@pytest.fixture()
def real_h5_world(tmp_path, rng):
    """Shared real-annotation + synthetic-h5 fixture (release layout):
    a subset of /root/reference/data/tvr_val_release.jsonl with feature
    files shaped exactly like the 33GB release (vid_name -> (n_clips, D),
    desc_id -> (n_tok, Dq))."""
    if not os.path.exists(f"{REF_DATA}/tvr_val_release.jsonl"):
        pytest.skip("reference data not mounted")
    import h5py
    from tvretrieval_tpu.utils.io import load_json, load_jsonl, save_json, save_jsonl

    rows = load_jsonl(f"{REF_DATA}/tvr_val_release.jsonl")[:24]
    vid2dur = load_json(f"{REF_DATA}/tvr_video2dur_idx.json")["val"]
    vid_names = sorted({r["vid_name"] for r in rows})
    sub_index = {"val": {v: vid2dur[v] for v in vid_names}}
    idx_path = str(tmp_path / "video2dur_idx.json")
    save_json(sub_index, idx_path)

    vid_dim, sub_dim, q_dim = 32, 24, 20
    for name, dim in (("vid_feat", vid_dim), ("sub_feat", sub_dim)):
        with h5py.File(tmp_path / f"{name}.h5", "w") as h5:
            for v in vid_names:
                n_clips = min(int(vid2dur[v][0] // 1.5) + 1, 100)
                h5.create_dataset(v, data=rng.normal(
                    size=(n_clips, dim)).astype(np.float32))
    with h5py.File(tmp_path / "desc_feat.h5", "w") as h5:
        for r in rows:
            n_tok = min(len(r["desc"].split()) + 2, 30)
            h5.create_dataset(str(r["desc_id"]), data=rng.normal(
                size=(n_tok, q_dim)).astype(np.float32))
    ann_path = str(tmp_path / "train.jsonl")
    save_jsonl(rows, ann_path)
    flags = [
        "--train_path", ann_path, "--eval_path", ann_path,
        "--desc_bert_path", str(tmp_path / "desc_feat.h5"),
        "--sub_bert_path", str(tmp_path / "sub_feat.h5"),
        "--vid_feat_path", str(tmp_path / "vid_feat.h5"),
        "--video_duration_idx_path", idx_path,
        "--results_root", str(tmp_path),
    ]
    return rows, flags, tmp_path


def test_train_mee_on_h5_with_real_annotations(real_h5_world):
    """MEE driver (reference mixture_embedding_experts/train.py) on real
    TVR annotation formats + release-layout h5 features, through training,
    eval, checkpointing, and standalone inference."""
    rows, flags, tmp_path = real_h5_world
    from tvretrieval_tpu.training.train_mee import start_training
    out = start_training(flags + [
        "--exp_id", "h5mee", "--ctx_mode", "video_sub",
        "--n_epoch", "1", "--bsz", "16", "--output_size", "16",
        "--eval_query_bsz", "12", "--eval_ctx_bsz", "8", "--max_es_cnt", "1",
    ])
    m = out["best_metrics"]
    assert m is not None and "VR" in m and 0.0 <= m["VR"]["r100"] <= 100.0
    from tvretrieval_tpu.retrieval.inference_baselines import start_inference
    res = start_inference(["--model_type", "mee",
                           "--model_dir", out["results_dir"]])
    assert "VR" in res["metrics"]


def test_train_cal_on_h5_with_real_annotations(real_h5_world):
    """CAL driver (reference clip_alignment_with_language/train.py) on real
    TVR annotations: sliding-window proposals over REAL durations, triplet
    sampling, eval through the proposal engine + evaluator."""
    rows, flags, tmp_path = real_h5_world
    from tvretrieval_tpu.training.train_cal import start_training
    out = start_training(flags + [
        "--exp_id", "h5cal", "--ctx_mode", "video_sub_tef",
        "--n_epoch", "1", "--bsz", "12", "--visual_hidden_size", "32",
        "--output_size", "16", "--lstm_hidden_size", "24",
        "--max_moment_clips", "8", "--eval_query_bsz", "8",
        "--max_es_cnt", "1", "--lr", "0.02",
    ])
    m = out["best_metrics"]
    assert m is not None and "VCMR" in m and "SVMR" in m
    assert 0.0 <= m["VCMR"]["0.5-r100"] <= 100.0
    from tvretrieval_tpu.utils.io import load_json
    sub = load_json(os.path.join(out["results_dir"], "best_predictions.json"))
    assert {e["desc_id"] for e in sub["VCMR"]} == {r["desc_id"] for r in rows}


def test_train_excl_on_h5_with_real_annotations(real_h5_world):
    """ExCL driver (reference excl/train.py) on real TVR annotations:
    SVMR-only training + eval with real clip-label conversion from the
    release's ts fields."""
    rows, flags, tmp_path = real_h5_world
    from tvretrieval_tpu.training.train_excl import start_training
    out = start_training(flags + [
        "--exp_id", "h5excl", "--ctx_mode", "video_sub",
        "--n_epoch", "1", "--bsz", "12", "--hidden_size", "32",
        "--eval_query_bsz", "8", "--max_es_cnt", "1",
    ])
    m = out["best_metrics"]
    assert m is not None and "SVMR" in m
    assert 0.0 <= m["SVMR"]["0.5-r100"] <= 100.0

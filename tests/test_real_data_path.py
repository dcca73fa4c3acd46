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

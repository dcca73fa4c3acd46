"""Tiny end-to-end runs of the baseline drivers on synthetic worlds (CPU)."""
import numpy as np
import pytest


def test_mee_driver_e2e(tmp_path):
    from tvretrieval_tpu.training.train_mee import start_training
    out = start_training([
        "--synthetic", "--exp_id", "t", "--results_root", str(tmp_path),
        "--n_epoch", "30", "--bsz", "16", "--synthetic_videos", "10",
        "--synthetic_queries", "48", "--output_size", "16",
        "--eval_query_bsz", "12", "--eval_ctx_bsz", "10", "--lr", "1e-3",
    ])
    assert out["best_metrics"] is not None
    # above chance (1/10 videos = 10%) on the planted signal
    assert out["best_metrics"]["VR"]["r5"] > 50.0, out["best_metrics"]["VR"]

    # standalone inference from the saved checkpoint reproduces metrics
    from tvretrieval_tpu.retrieval.inference_baselines import start_inference
    res = start_inference(["--model_type", "mee",
                           "--model_dir", out["results_dir"]])
    assert res["metrics"]["VR"]["r5"] > 50.0, res["metrics"]["VR"]


def test_excl_driver_e2e(tmp_path):
    from tvretrieval_tpu.training.train_excl import start_training
    out = start_training([
        "--synthetic", "--exp_id", "t", "--results_root", str(tmp_path),
        "--n_epoch", "4", "--bsz", "12", "--synthetic_videos", "8",
        "--synthetic_queries", "36", "--hidden_size", "32",
        "--max_ctx_l", "24", "--max_desc_l", "20", "--eval_query_bsz", "9",
        "--min_pred_l", "1", "--max_pred_l", "10", "--drop", "0.2",
    ])
    m = out["best_metrics"]
    assert m is not None and "SVMR" in m
    assert m["SVMR"]["0.5-r100"] > 50.0, m["SVMR"]


def test_cal_driver_e2e(tmp_path):
    from tvretrieval_tpu.training.train_cal import start_training
    out = start_training([
        "--synthetic", "--exp_id", "t", "--results_root", str(tmp_path),
        "--n_epoch", "4", "--bsz", "12", "--synthetic_videos", "8",
        "--synthetic_queries", "36", "--visual_hidden_size", "32",
        "--output_size", "16", "--lstm_hidden_size", "24",
        "--max_ctx_l", "24", "--max_desc_l", "20", "--max_moment_clips", "8",
        "--eval_query_bsz", "9", "--lr", "0.02",
    ])
    m = out["best_metrics"]
    assert m is not None and "VCMR" in m and "SVMR" in m
    # sanity: predictions exist and metrics are in range
    assert 0.0 <= m["VCMR"]["0.5-r100"] <= 100.0

    # standalone inference with proposal-cache persistence
    from tvretrieval_tpu.retrieval.inference_baselines import start_inference
    cache_path = str(tmp_path / "prop_cache.npz")
    res = start_inference(["--model_type", "cal",
                           "--model_dir", out["results_dir"],
                           "--proposal_cache_path", cache_path])
    assert "VCMR" in res["metrics"]
    import os
    assert os.path.exists(cache_path)
    # second run hits the cache
    res2 = start_inference(["--model_type", "cal",
                            "--model_dir", out["results_dir"],
                            "--proposal_cache_path", cache_path])
    assert res2["metrics"]["VCMR"] == res["metrics"]["VCMR"]

    # re-train recipe: warm-start params from the first run's checkpoint
    # (reference --init_ckpt_path, re_train_cal.sh)
    out2 = start_training([
        "--synthetic", "--exp_id", "t2", "--results_root", str(tmp_path),
        "--n_epoch", "1", "--bsz", "12", "--synthetic_videos", "8",
        "--synthetic_queries", "36", "--visual_hidden_size", "32",
        "--output_size", "16", "--lstm_hidden_size", "24",
        "--max_ctx_l", "24", "--max_desc_l", "20", "--max_moment_clips", "8",
        "--eval_query_bsz", "9", "--lr", "0.02",
        "--init_ckpt_path", os.path.join(out["results_dir"], "ckpt"),
    ])
    assert out2["best_metrics"] is not None

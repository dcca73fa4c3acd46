"""End-to-end driver tests for non-flagship configurations.

- XML sub+tef only (BASELINE.json config #2): single context stream kills
  cross-attention and stream merging (reference config.py:256-258).
- DiDeMo-style multi-annotation data: agreed-ts training labels + dict-path
  (multi-ts) evaluation.
"""
import numpy as np
import pytest


def test_xml_sub_tef_only_driver(tmp_path):
    from tvretrieval_tpu.training.train_xml import start_training
    out = start_training([
        "--synthetic", "--exp_id", "subtef", "--results_root", str(tmp_path),
        "--ctx_mode", "sub_tef", "--n_epoch", "3", "--bsz", "16",
        "--synthetic_videos", "10", "--synthetic_queries", "48",
        "--hidden_size", "32", "--max_ctx_l", "24", "--max_desc_l", "20",
        "--eval_query_bsz", "12", "--eval_context_bsz", "10",
        "--max_vcmr_video", "8", "--min_pred_l", "1", "--max_pred_l", "10",
        "--lw_st_ed", "0.05",
    ])
    m = out["best_metrics"]
    assert m is not None and "VCMR" in m and "VR" in m
    # sub stream alone still learns the planted signal above chance (1/10)
    assert m["VR"]["r5"] > 30.0, m["VR"]


def test_didemo_style_training(tmp_path):
    """dset_name=didemo: ts is a list of annotator spans; training uses the
    agreed (most frequent) span, eval uses the >=2-overlap rule."""
    from tvretrieval_tpu.data.datasets import ExampleBuilder
    from tvretrieval_tpu.data.synthetic import make_synthetic_world
    from tvretrieval_tpu.evaluation.metrics import eval_retrieval
    from tvretrieval_tpu.evaluation.submission import submission_top_n
    from tvretrieval_tpu.models.xml import XMLConfig
    from tvretrieval_tpu.retrieval.engine import (
        RetrievalConfig, encode_corpus, retrieve)
    from tvretrieval_tpu.training.xml_trainer import TrainSettings, XMLTrainer

    world = make_synthetic_world(n_videos=8, n_queries=24, vid_dim=16,
                                 text_dim=12, max_clips=12, seed=31)
    # convert to didemo-style: 4 annotator spans, 3 agreeing
    rows = []
    rng = np.random.default_rng(0)
    for r in world.annotations:
        ts = r["ts"]
        other = [float(rng.uniform(0, r["duration"] / 2)),
                 float(rng.uniform(r["duration"] / 2, r["duration"]))]
        rows.append({**r, "ts": [list(ts), list(ts), list(ts), other]})

    builder = ExampleBuilder(
        query_source=world.query_source, video_source=world.video_source,
        sub_source=world.sub_source, ctx_mode="video_sub_tef",
        max_desc_l=16, max_ctx_l=12, clip_length=world.clip_length,
        dset_name="didemo")
    cfg = XMLConfig(ctx_mode="video_sub", visual_input_size=18,
                    sub_input_size=14, query_input_size=16, hidden_size=16,
                    n_heads=4, max_ctx_l=12, max_desc_l=16)
    settings = TrainSettings(lr=3e-4, n_epoch=2, bsz=8, lw_st_ed=0.05, seed=1)
    trainer = XMLTrainer(cfg, settings, builder, rows, mesh=None)
    losses = trainer.train_epoch(0)
    assert np.isfinite(losses["loss_overall"])

    rcfg = RetrievalConfig(query_bsz=8, context_bsz=8, max_vcmr_video=6,
                           min_pred_l=1, max_pred_l=10,
                           clip_length=world.clip_length)
    cache = encode_corpus(trainer.model, trainer.variables(), builder,
                          world.corpus, rcfg)
    raw = retrieve(trainer.model, trainer.variables(), builder, cache,
                   rows, world.corpus, rcfg, tasks=("VCMR", "SVMR"))
    raw["video2idx"] = world.corpus.video2idx
    # dict-path evaluation handles the multi-annotation (>=2 overlap) rule
    metrics = eval_retrieval(submission_top_n(raw, 100), rows,
                             use_desc_type=False)
    assert "VCMR" in metrics and 0.0 <= metrics["VCMR"]["0.5-r100"] <= 100.0

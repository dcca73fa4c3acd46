"""End-to-end smoke: train XML on a synthetic world, run corpus inference,
evaluate, and check the planted signal is actually learned (SURVEY.md §4)."""
import numpy as np
import pytest

from tvretrieval_tpu.data.datasets import ExampleBuilder
from tvretrieval_tpu.data.synthetic import make_synthetic_world
from tvretrieval_tpu.evaluation.metrics import eval_retrieval
from tvretrieval_tpu.evaluation.submission import submission_top_n
from tvretrieval_tpu.models.xml import XMLConfig
from tvretrieval_tpu.retrieval.engine import RetrievalConfig, encode_corpus, retrieve
from tvretrieval_tpu.training.xml_trainer import TrainSettings, XMLTrainer


@pytest.fixture(scope="module")
def tiny_world():
    return make_synthetic_world(
        n_videos=12, n_queries=48, vid_dim=24, text_dim=16,
        max_clips=16, signal=3.0, seed=11)


def _builder(world):
    return ExampleBuilder(
        query_source=world.query_source, video_source=world.video_source,
        sub_source=world.sub_source, ctx_mode="video_sub_tef",
        max_desc_l=30, max_ctx_l=20, clip_length=world.clip_length)


def _model_cfg(world, builder):
    return XMLConfig(
        ctx_mode="video_sub", visual_input_size=builder.video_source.dim + 2,
        sub_input_size=builder.sub_source.dim + 2,
        query_input_size=builder.query_source.dim,
        hidden_size=32, n_heads=4, max_ctx_l=20, max_desc_l=30,
        input_drop=0.1, drop=0.1)


def test_train_then_retrieve_then_eval(tiny_world):
    world = tiny_world
    builder = _builder(world)
    cfg = _model_cfg(world, builder)
    settings = TrainSettings(
        lr=5e-4, n_epoch=12, bsz=16, lw_st_ed=0.02,
        hard_negative_start_epoch=8, hard_pool_size=4, seed=0)
    trainer = XMLTrainer(cfg, settings, builder, world.annotations, mesh=None)

    first = trainer.train_epoch(0)
    for epoch in range(1, settings.n_epoch):
        last = trainer.train_epoch(epoch)
    assert last["loss_overall"] < first["loss_overall"], \
        f"loss did not decrease: {first} -> {last}"

    rcfg = RetrievalConfig(query_bsz=16, context_bsz=12, max_vcmr_video=10,
                           min_pred_l=1, max_pred_l=10,
                           clip_length=world.clip_length)
    cache = encode_corpus(trainer.model, trainer.variables(), builder,
                          world.corpus, rcfg)
    assert cache.video_feat1.shape == (12, 20, 32)
    raw = retrieve(trainer.model, trainer.variables(), builder, cache,
                   world.annotations, world.corpus, rcfg)
    raw["video2idx"] = world.corpus.video2idx
    submission = submission_top_n(raw, 100)

    metrics = eval_retrieval(submission, world.annotations)
    # planted signal must be learned: VR r1 way above chance (1/12 = 8.3%)
    assert metrics["VR"]["r1"] > 30.0, metrics["VR"]
    # moments must beat random within retrieved videos
    assert metrics["VCMR"]["0.5-r10"] > 10.0, metrics["VCMR"]
    assert metrics["SVMR"]["0.5-r5"] > 10.0, metrics["SVMR"]

    # submission format contract
    entry = submission["VCMR"][0]
    assert set(entry) == {"desc_id", "desc", "predictions"}
    assert len(entry["predictions"][0]) == 4

    # scores must be sorted descending per query
    scores = [p[3] for p in entry["predictions"]]
    assert scores == sorted(scores, reverse=True)


def test_eval_loss_includes_remainder_batch(tiny_world):
    """Eval loss must cover ALL rows: a set smaller than bsz still yields a
    loss dict, and remainder rows contribute to the per-batch average
    (reference evaluates every DataLoader batch, train.py:178-179)."""
    world = tiny_world
    builder = _builder(world)
    cfg = _model_cfg(world, builder)
    settings = TrainSettings(lr=1e-4, n_epoch=1, bsz=16, seed=4)
    trainer = XMLTrainer(cfg, settings, builder, world.annotations[:16], mesh=None)

    small = trainer.eval_loss_epoch(world.annotations[:5], epoch=0)
    assert small and np.isfinite(small["loss_overall"])

    head = trainer.eval_loss_epoch(world.annotations[:16], epoch=0)
    tail = trainer.eval_loss_epoch(world.annotations[16:21], epoch=0)
    full = trainer.eval_loss_epoch(world.annotations[:21], epoch=0)
    assert full["loss_overall"] == pytest.approx(
        (head["loss_overall"] + tail["loss_overall"]) / 2, rel=1e-6)


def test_external_vr_mode(tiny_world, tmp_path):
    """XML VCMR guided by an external VR submission must only rank videos
    from that submission (reference inference.py:346-355)."""
    import json
    world = tiny_world
    builder = _builder(world)
    cfg = _model_cfg(world, builder)
    settings = TrainSettings(lr=1e-4, n_epoch=1, bsz=8, seed=4)
    trainer = XMLTrainer(cfg, settings, builder, world.annotations[:16], mesh=None)
    trainer.train_epoch(0)
    rcfg = RetrievalConfig(query_bsz=8, context_bsz=12, max_vcmr_video=3,
                           min_pred_l=1, max_pred_l=10,
                           clip_length=world.clip_length)
    cache = encode_corpus(trainer.model, trainer.variables(), builder,
                          world.corpus, rcfg)
    rows = world.annotations[:8]
    # build a fake external VR submission: each query -> 3 fixed videos
    ext = {"video2idx": world.corpus.video2idx, "VR": []}
    for qi, r in enumerate(rows):
        vids = [world.corpus.video2idx[world.corpus.vid_names[(qi + j) % 12]]
                for j in range(3)]
        ext["VR"].append({"desc_id": r["desc_id"], "desc": "",
                          "predictions": [[v, 0, 0, 0.5 - 0.1 * j]
                                          for j, v in enumerate(vids)]})
    ext_path = str(tmp_path / "ext_vr.json")
    json.dump(ext, open(ext_path, "w"))

    raw = retrieve(trainer.model, trainer.variables(), builder, cache,
                   rows, world.corpus, rcfg, tasks=("VCMR",),
                   external_vr_path=ext_path)
    for qi, entry in enumerate(raw["VCMR"]):
        allowed = {p[0] for p in ext["VR"][qi]["predictions"]}
        got = {p[0] for p in entry["predictions"] if p[3] > 0}
        assert got <= allowed, f"query {qi}: videos outside external VR list"


def test_bfloat16_training_learns(tiny_world):
    """bf16 compute dtype: loss decreases, outputs finite (mixed precision:
    params fp32, matmuls bf16 with fp32 accumulation)."""
    world = tiny_world
    builder = _builder(world)
    cfg = _model_cfg(world, builder)
    cfg = XMLConfig(**{**cfg.__dict__, "dtype_str": "bfloat16"})
    settings = TrainSettings(lr=5e-4, n_epoch=4, bsz=16, lw_st_ed=0.02, seed=7)
    trainer = XMLTrainer(cfg, settings, builder, world.annotations, mesh=None)
    first = trainer.train_epoch(0)
    for epoch in range(1, 4):
        last = trainer.train_epoch(epoch)
    assert np.isfinite(last["loss_overall"])
    assert last["loss_overall"] < first["loss_overall"]


def test_no_gt_split_submission_only(tiny_world, tmp_path):
    """test_public-style rows (no ts/vid_name) -> submission written, SVMR
    dropped, no metrics (reference inference.py:494-503)."""
    import argparse
    import os
    from tvretrieval_tpu.training.train_xml import evaluate_retrieval
    world = tiny_world
    builder = _builder(world)
    cfg = _model_cfg(world, builder)
    settings = TrainSettings(lr=1e-4, n_epoch=1, bsz=8, seed=5)
    trainer = XMLTrainer(cfg, settings, builder, world.annotations[:16], mesh=None)
    rows = [{"desc_id": r["desc_id"], "desc": r["desc"]}
            for r in world.annotations[:6]]
    args = argparse.Namespace(
        q2c_alpha=20.0, min_pred_l=1, max_pred_l=10, max_before_nms=40,
        max_vcmr_video=8, eval_query_bsz=6, eval_context_bsz=12,
        clip_length=world.clip_length, dset_name="tvr", nms_thd=0.5)
    metrics, metrics_nms, paths = evaluate_retrieval(
        trainer.model, trainer.variables(), builder, world.corpus, rows, args,
        tasks=("VCMR", "SVMR", "VR"), results_dir=str(tmp_path), tag="test",
        apply_nms=True)
    assert metrics is None and metrics_nms is None
    assert os.path.exists(paths[0])
    import json
    sub = json.load(open(paths[0]))
    assert "VCMR" in sub and "VR" in sub and "SVMR" not in sub
    assert len(paths) == 2  # submission + nms submission, no metric files


def test_checkpoint_roundtrip(tiny_world, tmp_path):
    import jax
    world = tiny_world
    builder = _builder(world)
    cfg = _model_cfg(world, builder)
    settings = TrainSettings(lr=1e-4, n_epoch=1, bsz=8, seed=3)
    trainer = XMLTrainer(cfg, settings, builder, world.annotations[:16], mesh=None)
    trainer.train_epoch(0)

    from tvretrieval_tpu.training.checkpoint import load_checkpoint, save_checkpoint
    save_checkpoint(str(tmp_path / "ck"), trainer.params, trainer.opt_state, cfg, epoch=0)
    params2, opt_state2, cfg_dict, epoch = load_checkpoint(str(tmp_path / "ck"))
    assert epoch == 0
    assert cfg_dict["hidden_size"] == 32
    flat1 = jax.tree_util.tree_leaves(trainer.params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Data-layer tests: label conventions, TEF, fixed-shape building, batching."""
import numpy as np

from tvretrieval_tpu.data.datasets import (
    ExampleBuilder, train_st_ed_label, eval_st_ed_label, tef_features,
)
from tvretrieval_tpu.data.pipeline import BatchIterator, DevicePrefetcher
from tvretrieval_tpu.data.synthetic import make_synthetic_world


def test_st_ed_labels_reference_docstring_cases():
    # reference start_end_dataset.py:147-162 examples
    assert train_st_ed_label([3.2, 7.6], 1.5, max_idx=99).tolist() == [2, 6]
    assert eval_st_ed_label([3.2, 7.6], 1.5, max_idx=99).tolist() == [2, 5]
    # start_end_dataset.py:277-295 example: ts=[5, 9] -> eval [3, 5]
    assert eval_st_ed_label([5.0, 9.0], 1.5, max_idx=99).tolist() == [3, 5]
    assert train_st_ed_label([5.0, 9.0], 1.5, max_idx=99).tolist() == [3, 6]
    # clamping at the video end
    assert train_st_ed_label([140.0, 160.0], 1.5, max_idx=10).tolist() == [10, 10]


def test_tef_features():
    tef = tef_features(4)
    np.testing.assert_allclose(tef[:, 0], [0.0, 0.25, 0.5, 0.75])
    np.testing.assert_allclose(tef[:, 1], [0.25, 0.5, 0.75, 1.0])


def _make_builder(world, ctx_mode="video_sub_tef"):
    return ExampleBuilder(
        query_source=world.query_source,
        video_source=world.video_source,
        sub_source=world.sub_source,
        ctx_mode=ctx_mode,
        max_desc_l=30, max_ctx_l=100, clip_length=world.clip_length,
    )


def test_example_builder_fixed_shapes():
    world = make_synthetic_world(n_videos=6, n_queries=10, seed=1)
    builder = _make_builder(world)
    batch = builder.build_train_batch(world.annotations[:4])
    assert batch.query_feat.shape == (4, 30, world.query_source.dim)
    assert batch.video_feat.shape == (4, 100, world.video_source.dim + 2)
    assert batch.sub_feat.shape == (4, 100, world.sub_source.dim + 2)
    assert batch.video_mask.shape == (4, 100)
    # mask matches true clip count
    row = world.annotations[0]
    n_clips = world.video_source.get(row["vid_name"]).shape[0]
    assert batch.video_mask[0].sum() == n_clips
    # features are L2-normalized where mask is on
    norms = np.linalg.norm(batch.video_feat[0, :n_clips, :-2], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # TEF occupies last two dims
    np.testing.assert_allclose(batch.video_feat[0, 0, -2:], [0.0, 1.0 / n_clips], atol=1e-6)
    # labels within mask
    assert (batch.st_ed_indices[:, 0] <= batch.st_ed_indices[:, 1]).all()


def test_example_builder_sub_only_mode():
    world = make_synthetic_world(n_videos=4, n_queries=6, seed=2)
    builder = ExampleBuilder(
        query_source=world.query_source, sub_source=world.sub_source,
        ctx_mode="sub_tef", max_desc_l=30, max_ctx_l=100, clip_length=1.5)
    batch = builder.build_train_batch(world.annotations[:3])
    assert batch.sub_feat.shape[-1] == world.sub_source.dim + 2
    assert batch.video_feat.shape[-1] == 2  # placeholder
    assert batch.video_mask.sum() > 0  # mask mirrors sub stream


def test_context_batch_and_query_batch():
    world = make_synthetic_world(n_videos=5, n_queries=8, seed=3)
    builder = _make_builder(world)
    ctx = builder.build_context_batch(world.corpus.vid_names, world.corpus.durations)
    assert ctx.video_feat.shape[0] == 5
    qb = builder.build_query_batch(world.annotations[:8])
    assert qb.query_feat.shape == (8, 30, world.query_source.dim)
    assert qb.meta[0]["desc_id"] == world.annotations[0]["desc_id"]


def test_prebuilt_examples_match_per_row_builder():
    """PrebuiltExamples batches must equal ExampleBuilder batches exactly
    (same arrays, bit-for-bit), for train and eval label conventions."""
    from tvretrieval_tpu.data.datasets import PrebuiltExamples

    world = make_synthetic_world(n_videos=7, n_queries=20, seed=9)
    builder = _make_builder(world)
    rows = world.annotations
    pre = PrebuiltExamples(builder, rows)
    for sel in ([0, 3, 5, 5, 12], list(range(20))):
        batch_rows = [rows[i] for i in sel]
        a = builder.build_train_batch(batch_rows)
        b = pre.batch_for_rows(batch_rows)
        for k in ("query_feat", "query_mask", "video_feat", "video_mask",
                  "sub_feat", "sub_mask", "st_ed_indices"):
            np.testing.assert_array_equal(getattr(a, k), getattr(b, k), err_msg=k)

    pre_eval = PrebuiltExamples(builder, rows, eval_labels=True)
    a = builder.build_train_batch(rows[:6], eval_labels=True)
    b = pre_eval.batch_for_rows(rows[:6])
    np.testing.assert_array_equal(a.st_ed_indices, b.st_ed_indices)


def test_trainer_prebuild_examples_end_to_end():
    """XMLTrainer(prebuild_examples=True) trains identically-shaped steps and
    falls back to the per-row builder for rows outside the cache."""
    from tvretrieval_tpu.models.xml import XMLConfig
    from tvretrieval_tpu.training.xml_trainer import TrainSettings, XMLTrainer

    world = make_synthetic_world(n_videos=6, n_queries=24, vid_dim=16,
                                 text_dim=12, max_clips=12, seed=13)
    builder = ExampleBuilder(
        query_source=world.query_source, video_source=world.video_source,
        sub_source=world.sub_source, ctx_mode="video_sub_tef",
        max_desc_l=16, max_ctx_l=12, clip_length=world.clip_length)
    cfg = XMLConfig(ctx_mode="video_sub", visual_input_size=18,
                    sub_input_size=14, query_input_size=16, hidden_size=16,
                    n_heads=4, max_ctx_l=12, max_desc_l=16)
    train_rows, eval_rows = world.annotations[:16], world.annotations[16:]
    settings = TrainSettings(lr=1e-4, n_epoch=1, bsz=8, seed=3,
                             prebuild_examples=True)
    trainer = XMLTrainer(cfg, settings, builder, train_rows, mesh=None)
    losses = trainer.train_epoch(0)
    assert np.isfinite(losses["loss_overall"])
    # eval rows are not in the prebuilt cache -> per-row fallback
    ev = trainer.eval_loss_epoch(eval_rows, 0)
    assert ev and np.isfinite(ev["loss_overall"])


def test_batch_iterator_deterministic_and_drop_last():
    rows = [{"i": i} for i in range(10)]
    it = BatchIterator(rows, batch_size=4, shuffle=True, drop_last=True, seed=7)
    assert len(it) == 2
    e0 = [tuple(r["i"] for r in b) for b in it]
    it2 = BatchIterator(rows, batch_size=4, shuffle=True, drop_last=True, seed=7)
    e0b = [tuple(r["i"] for r in b) for b in it2]
    assert e0 == e0b  # same seed, same epoch -> same order
    e1 = [tuple(r["i"] for r in b) for b in it2]
    assert e0 != e1  # next epoch reshuffles


def test_device_prefetcher_multiworker_order():
    rows = [[{"i": i}] for i in range(12)]
    pf = DevicePrefetcher(iter(rows), build_fn=lambda b: b[0]["i"] * 3,
                          n_workers=4)
    assert list(pf) == [i * 3 for i in range(12)]


def test_device_prefetcher_preserves_order_and_propagates_errors():
    rows = [[{"i": i}] for i in range(5)]
    pf = DevicePrefetcher(iter(rows), build_fn=lambda b: b[0]["i"] * 2)
    assert list(pf) == [0, 2, 4, 6, 8]

    def boom(b):
        raise ValueError("boom")
    pf2 = DevicePrefetcher(iter(rows), build_fn=boom)
    try:
        list(pf2)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_batched_builders_bit_identical_to_per_item():
    """build_contexts / build_queries (the vectorized one-time-build path,
    round-3 VERDICT #5) must be BIT-identical to the per-item context()/
    query() across ctx modes — including TEF's exact f32 op order and the
    video/sub length-alignment truncation."""
    world = make_synthetic_world(n_videos=9, n_queries=14, max_clips=23,
                                 seed=3)
    for ctx_mode in ("video_sub_tef", "video_sub", "video_tef", "sub_tef",
                     "video", "sub", "tef"):
        builder = ExampleBuilder(
            query_source=world.query_source,
            video_source=world.video_source if "video" in ctx_mode else None,
            sub_source=world.sub_source if "sub" in ctx_mode else None,
            ctx_mode=ctx_mode, max_desc_l=16, max_ctx_l=23,
            clip_length=world.clip_length)
        names = world.corpus.vid_names
        durs = world.corpus.durations
        bv, bs, bm, bcl = builder.build_contexts(names, durs)
        for i, (vid, dur) in enumerate(zip(names, durs)):
            v, s, m, cl = builder.context(vid, dur)
            np.testing.assert_array_equal(bv[i], v, err_msg=f"{ctx_mode} v{i}")
            np.testing.assert_array_equal(bs[i], s, err_msg=f"{ctx_mode} s{i}")
            np.testing.assert_array_equal(bm[i], m, err_msg=f"{ctx_mode} m{i}")
            assert bcl[i] == cl, (ctx_mode, i)
        ids = [r["desc_id"] for r in world.annotations[:10]]
        bq, bqm = builder.build_queries(ids)
        for i, d in enumerate(ids):
            q, qm = builder.query(d)
            np.testing.assert_array_equal(bq[i], q, err_msg=f"{ctx_mode} q{i}")
            np.testing.assert_array_equal(bqm[i], qm)


def test_batched_builders_length_mismatch_truncation():
    """The off-by-a-clip h5 guard (context() truncates both streams to the
    shorter) must survive vectorization."""
    from tvretrieval_tpu.data.features import MemoryFeatureSource

    rng = np.random.default_rng(0)
    vids = {"a": rng.normal(size=(7, 4)).astype("f4"),
            "b": rng.normal(size=(5, 4)).astype("f4")}
    subs = {"a": rng.normal(size=(6, 3)).astype("f4"),   # shorter than video
            "b": rng.normal(size=(5, 3)).astype("f4")}
    qs = {"0": rng.normal(size=(4, 6)).astype("f4")}
    builder = ExampleBuilder(
        query_source=MemoryFeatureSource(qs),
        video_source=MemoryFeatureSource(vids),
        sub_source=MemoryFeatureSource(subs),
        ctx_mode="video_sub_tef", max_desc_l=8, max_ctx_l=10,
        clip_length=1.5)
    bv, bs, bm, bcl = builder.build_contexts(["a", "b"], [10.0, 7.0])
    assert bcl.tolist() == [6, 5]
    for i, vid in enumerate(["a", "b"]):
        v, s, m, cl = builder.context(vid, 10.0)
        np.testing.assert_array_equal(bv[i], v)
        np.testing.assert_array_equal(bs[i], s)
        np.testing.assert_array_equal(bm[i], m)

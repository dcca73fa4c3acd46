"""simsweep span scoring must match the gathered path (exactness test).

The engine's "simsweep" mode replaces the top-V feature-row gather
(reference op: model_xml.py:463-480 restricted to inference.py:348's top
videos) with a full-corpus similarity einsum + sim-row gather. Per the
repo convention, the optimized path is pinned against the unoptimized one.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvretrieval_tpu.data.datasets import ExampleBuilder
from tvretrieval_tpu.data.synthetic import make_synthetic_world
from tvretrieval_tpu.models.xml import XML, XMLConfig
from tvretrieval_tpu.retrieval.engine import (
    RetrievalConfig, _score_query_batch, encode_corpus)


@pytest.fixture(scope="module", params=["float32", "bfloat16"])
def setup(request):
    world = make_synthetic_world(n_videos=23, n_queries=10, vid_dim=16,
                                 text_dim=12, max_clips=14, seed=7)
    builder = ExampleBuilder(
        query_source=world.query_source, video_source=world.video_source,
        sub_source=world.sub_source, ctx_mode="video_sub_tef",
        max_desc_l=16, max_ctx_l=14, clip_length=world.clip_length)
    cfg = XMLConfig(ctx_mode="video_sub", visual_input_size=18,
                    sub_input_size=14, query_input_size=16, hidden_size=16,
                    n_heads=4, max_ctx_l=14, max_desc_l=16)
    model = XML(cfg)
    qb = builder.build_train_batch(world.annotations[:6])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "negatives": jax.random.PRNGKey(2)},
        **{k: jnp.asarray(v) for k, v in qb.model_inputs().items()},
        deterministic=True)
    rcfg = RetrievalConfig(max_vcmr_video=9, max_before_nms=50,
                           min_pred_l=1, max_pred_l=8, context_bsz=8,
                           query_bsz=6, cache_dtype_str=request.param,
                           span_score_mode="gather")
    cache = encode_corpus(model, variables, builder, world.corpus, rcfg)
    return world, builder, model, variables, rcfg, cache, qb


def _run(model, variables, rcfg, cache, qb, n_videos, mode, pad_l=0):
    rcfg = dataclasses.replace(rcfg, span_score_mode=mode,
                               span_sim_pad_l=pad_l)
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % n_videos, jnp.int32)
    kw = {}
    if mode == "simsweep_cat_int8":
        from tvretrieval_tpu.ops.pallas_score import quantize_rows_i8
        f2c = jnp.concatenate(
            [cache.video_feat2, cache.sub_feat2], axis=-1)
        kw["feat2_cat"], kw["feat2_cat_scale"] = quantize_rows_i8(f2c)
    elif mode == "simsweep_cat_int8_flat":
        from tvretrieval_tpu.ops.pallas_score import build_flat_feat2_i8
        rcfg = dataclasses.replace(rcfg, pallas_interpret=True)
        f2c = jnp.concatenate(
            [cache.video_feat2, cache.sub_feat2], axis=-1)
        kw["feat2_cat"], kw["feat2_cat_scale"] = build_flat_feat2_i8(f2c)
    elif mode.startswith("simsweep_cat"):
        kw["feat2_cat"] = jnp.concatenate(
            [cache.video_feat2, cache.sub_feat2], axis=-1)
        if pad_l:
            L = kw["feat2_cat"].shape[1]
            kw["feat2_cat"] = jnp.pad(
                kw["feat2_cat"], ((0, 0), (0, pad_l - L), (0, 0)))
    out = _score_query_batch(model, variables, rcfg, qf, qm,
                             cache.video_feat1, cache.video_feat2,
                             cache.sub_feat1, cache.sub_feat2,
                             cache.mask, gt, True, **kw)
    return {k: np.asarray(v) for k, v in out.items()}


def test_simsweep_matches_gather(setup):
    world, builder, model, variables, rcfg, cache, qb = setup
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos, "gather")
    out = _run(model, variables, rcfg, cache, qb, cache.n_videos, "simsweep")

    assert set(out) == set(ref)
    # video ranking is untouched by the span-score mode: exact
    np.testing.assert_array_equal(out["topv_idx"], ref["topv_idx"])
    np.testing.assert_array_equal(out["topv_scores"], ref["topv_scores"])
    # span candidates: identical ranked (video, st, ed) and scores. The two
    # modes contract the same D-length dots at f32 accumulation, so scores
    # are expected bit-equal; allow 1e-6 for accumulation-order slack on
    # backends that tile the corpus-wide einsum differently.
    np.testing.assert_array_equal(out["vcmr_vid_local"], ref["vcmr_vid_local"])
    np.testing.assert_array_equal(out["vcmr_st"], ref["vcmr_st"])
    np.testing.assert_array_equal(out["vcmr_ed"], ref["vcmr_ed"])
    np.testing.assert_allclose(out["vcmr_scores"], ref["vcmr_scores"],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(out["svmr_st"], ref["svmr_st"])
    np.testing.assert_array_equal(out["svmr_ed"], ref["svmr_ed"])
    np.testing.assert_allclose(out["svmr_scores"], ref["svmr_scores"],
                               rtol=1e-6, atol=1e-9)


def test_simsweep_cat_matches_gather(setup):
    """The concatenated-cache variant folds the stream merge into one K=2D
    contraction: values match up to f32 accumulation order (K=2D single
    sum vs two K=D sums), so scores are allclose and the ranked candidate
    spans must agree wherever scores are not fp-level ties."""
    world, builder, model, variables, rcfg, cache, qb = setup
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos, "gather")
    out = _run(model, variables, rcfg, cache, qb, cache.n_videos,
               "simsweep_cat")
    np.testing.assert_array_equal(out["topv_idx"], ref["topv_idx"])
    np.testing.assert_allclose(out["vcmr_scores"], ref["vcmr_scores"],
                               rtol=2e-5, atol=1e-8)
    # spans should agree except possibly at fp-tie reorderings; on this
    # fixture the margin between ranked scores exceeds the fp slack
    same = (out["vcmr_st"] == ref["vcmr_st"]) & (out["vcmr_ed"] == ref["vcmr_ed"])
    assert same.mean() > 0.99
    np.testing.assert_allclose(out["svmr_scores"], ref["svmr_scores"],
                               rtol=2e-5, atol=1e-8)


def test_simsweep_cat_pad_l_exact(setup):
    """span_sim_pad_l (lane-tile-exact cat cache, engine flag pad128):
    the pad columns produce exact-zero similarities that are sliced off
    before conv — mathematically a no-op, so every selected index/span is
    identical and scores agree to accumulation-order slack (the changed
    einsum shape may re-tile the d-contraction; measured ulp-level on CPU
    at pad 128, bit-equal at pad 16 — same contract as simsweep vs
    gather). A parity mode, unlike the int8/approx families."""
    world, builder, model, variables, rcfg, cache, qb = setup
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos,
               "simsweep_cat")
    int_keys = ("topv_idx", "vcmr_vid_local", "vcmr_st", "vcmr_ed",
                "svmr_st", "svmr_ed")
    for pad_l in (16, 128):
        out = _run(model, variables, rcfg, cache, qb, cache.n_videos,
                   "simsweep_cat", pad_l=pad_l)
        for k in ref:
            if k in int_keys:
                np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
            else:
                np.testing.assert_allclose(out[k], ref[k], rtol=1e-5,
                                           atol=1e-8, err_msg=k)


def test_span_sim_pad_l_encode_corpus_and_validation(setup):
    """encode_corpus applies span_sim_pad_l to the cat cache it builds,
    and the padded cache scores exactly through the engine (indices
    identical, scores to accumulation-order slack); composing the flag
    with the int8 cat modes is rejected."""
    world, builder, model, variables, rcfg, cache, qb = setup
    rpad = dataclasses.replace(rcfg, span_score_mode="simsweep_cat",
                               span_sim_pad_l=128)
    cache_pad = encode_corpus(model, variables, builder, world.corpus, rpad)
    assert cache_pad.feat2_cat.shape[1] == 128

    qf, qm = jnp.asarray(qb.query_feat), jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    run = lambda cfg_, cache_: _score_query_batch(
        model, variables, cfg_, qf, qm, cache_.video_feat1,
        cache_.video_feat2, cache_.sub_feat1, cache_.sub_feat2,
        cache_.mask, gt, True, feat2_cat=cache_.feat2_cat)
    rcat = dataclasses.replace(rcfg, span_score_mode="simsweep_cat")
    cache_cat = encode_corpus(model, variables, builder, world.corpus, rcat)
    ref, out = run(rcat, cache_cat), run(rpad, cache_pad)
    int_keys = ("topv_idx", "vcmr_vid_local", "vcmr_st", "vcmr_ed",
                "svmr_st", "svmr_ed")
    for k in ref:
        if k in int_keys:
            np.testing.assert_array_equal(np.asarray(out[k]),
                                          np.asarray(ref[k]), err_msg=k)
        else:
            np.testing.assert_allclose(np.asarray(out[k]),
                                       np.asarray(ref[k]), rtol=1e-5,
                                       atol=1e-8, err_msg=k)

    with pytest.raises(ValueError, match="span_sim_pad_l"):
        encode_corpus(model, variables, builder, world.corpus,
                      dataclasses.replace(
                          rcfg, span_score_mode="simsweep_cat_int8",
                          span_sim_pad_l=128))


def test_simsweep_cat_bf16_close_to_cat(setup):
    """The bf16-stored similarity mode: video ranking is untouched
    (bit-equal) and span scores/candidates agree within the single bf16
    rounding (rel <= 2^-9) of the stored similarity. On this fixture the
    ranked-score margins exceed the rounding, so candidate identity holds
    almost everywhere."""
    world, builder, model, variables, rcfg, cache, qb = setup
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos,
               "simsweep_cat")
    out = _run(model, variables, rcfg, cache, qb, cache.n_videos,
               "simsweep_cat_bf16")
    np.testing.assert_array_equal(out["topv_idx"], ref["topv_idx"])
    np.testing.assert_array_equal(out["topv_scores"], ref["topv_scores"])
    # probs move by O(alpha-free softmax sensitivity to a 2^-9 logit
    # perturbation); scores are products of two probs and the video weight
    np.testing.assert_allclose(out["vcmr_scores"], ref["vcmr_scores"],
                               rtol=2e-2, atol=1e-6)
    same = ((out["vcmr_vid_local"] == ref["vcmr_vid_local"])
            & (out["vcmr_st"] == ref["vcmr_st"])
            & (out["vcmr_ed"] == ref["vcmr_ed"]))
    assert same.mean() > 0.95
    np.testing.assert_allclose(out["svmr_scores"], ref["svmr_scores"],
                               rtol=2e-2, atol=1e-6)


def test_simsweep_cat_int8_close_to_cat(setup):
    """The int8-stored concatenated cache: video ranking is untouched
    (bit-equal — the span-score mode never feeds the video stage) and span
    scores agree within the two input quantization roundings (per
    component <= row_max/254 on each side; integer accumulation exact).
    Candidate identity holds wherever ranked-score margins exceed that."""
    world, builder, model, variables, rcfg, cache, qb = setup
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos,
               "simsweep_cat")
    out = _run(model, variables, rcfg, cache, qb, cache.n_videos,
               "simsweep_cat_int8")
    np.testing.assert_array_equal(out["topv_idx"], ref["topv_idx"])
    np.testing.assert_array_equal(out["topv_scores"], ref["topv_scores"])
    np.testing.assert_allclose(out["vcmr_scores"], ref["vcmr_scores"],
                               rtol=0.2, atol=1e-5)
    same = ((out["vcmr_vid_local"] == ref["vcmr_vid_local"])
            & (out["vcmr_st"] == ref["vcmr_st"])
            & (out["vcmr_ed"] == ref["vcmr_ed"]))
    # tiny random fixture (hidden 16, near-uniform probs) is the worst
    # case for rank stability under quantization noise — the trained-
    # checkpoint A/B (BENCH_NOTES round 3) is the accuracy contract
    assert same.mean() > 0.75
    np.testing.assert_allclose(out["svmr_scores"], ref["svmr_scores"],
                               rtol=0.2, atol=1e-5)


def test_simsweep_cat_int8_cache_build_and_retrieve(setup):
    """encode_corpus under span_score_mode='simsweep_cat_int8' stores an
    int8 feat2_cat + (Nv, L) f32 scales, and the engine consumes them
    end-to-end with the video ranking bit-equal to the gather path."""
    world, builder, model, variables, rcfg, cache, qb = setup
    icfg = dataclasses.replace(rcfg, span_score_mode="simsweep_cat_int8")
    icache = encode_corpus(model, variables, builder, world.corpus, icfg)
    assert icache.feat2_cat.dtype == jnp.int8
    assert icache.feat2_cat_scale.shape == icache.mask.shape
    assert icache.video_feat2 is None and icache.sub_feat2 is None
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos, "gather")
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    out = _score_query_batch(model, variables, icfg, qf, qm,
                             icache.video_feat1, icache.video_feat2,
                             icache.sub_feat1, icache.sub_feat2,
                             icache.mask, gt, True,
                             feat2_cat=icache.feat2_cat,
                             feat2_cat_scale=icache.feat2_cat_scale)
    out = {k: np.asarray(v) for k, v in out.items()}
    np.testing.assert_array_equal(out["topv_idx"], ref["topv_idx"])
    np.testing.assert_allclose(out["vcmr_scores"], ref["vcmr_scores"],
                               rtol=0.2, atol=1e-5)


def test_quantize_rows_i8_error_bound():
    """Per-component reconstruction error <= scale/2 = row_max/254; all-zero
    rows quantize to zeros without dividing by zero."""
    from tvretrieval_tpu.ops.pallas_score import quantize_rows_i8
    x = np.random.default_rng(3).normal(size=(7, 5, 24)).astype(np.float32)
    x[2, 1] = 0.0
    q, s = quantize_rows_i8(jnp.asarray(x))
    assert q.dtype == jnp.int8 and s.shape == (7, 5)
    recon = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    bound = np.abs(x).max(axis=-1, keepdims=True) / 254.0 + 1e-7
    assert (np.abs(recon - x) <= bound).all()
    assert (np.asarray(q[2, 1]) == 0).all()


def test_video_topk_pre_exp_matches(setup):
    """video_topk_pre_exp=True: identical outputs on data without
    exp-collapsed f32 ties (exp is strictly monotone; the recomputed
    exp(alpha * q2c) of a selected video equals the post-exp value
    bit-for-bit — same op on the same input)."""
    world, builder, model, variables, rcfg, cache, qb = setup
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos, "gather")
    pcfg = dataclasses.replace(rcfg, video_topk_pre_exp=True)
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    out = _score_query_batch(model, variables, pcfg, qf, qm,
                             cache.video_feat1, cache.video_feat2,
                             cache.sub_feat1, cache.sub_feat2,
                             cache.mask, gt, True)
    out = {k: np.asarray(v) for k, v in out.items()}
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)


def test_pallas_flat_cache_engine_matches_einsum(setup):
    """ENGINE-LEVEL contract for video_score_mode='pallas': encode_corpus
    builds the flat mask-free feat1 layout and _score_query_batch consumes
    it through the kernel (interpret mode on CPU) — every output must be
    bit-equal to the einsum path (the kernel is bit-exact, so the whole
    program is)."""
    world, builder, model, variables, rcfg, cache, qb = setup
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos, "gather")

    pcfg = dataclasses.replace(rcfg, video_score_mode="pallas",
                               pallas_interpret=True)
    pcache = encode_corpus(model, variables, builder, world.corpus, pcfg)
    # encode_corpus flattened the feat1 slots (video-major, 8-aligned rows)
    from tvretrieval_tpu.ops.pallas_score import flat_lp
    lp = flat_lp(cache.mask.shape[1])
    assert pcache.video_feat1.ndim == 2
    assert pcache.video_feat1.shape[0] % lp == 0
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    out = _score_query_batch(model, variables, pcfg, qf, qm,
                             pcache.video_feat1, pcache.video_feat2,
                             pcache.sub_feat1, pcache.sub_feat2,
                             pcache.mask, gt, True)
    out = {k: np.asarray(v) for k, v in out.items()}
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)

    # flat caches are rejected by the streaming / sharded front-ends
    from tvretrieval_tpu.retrieval.streaming import host_cache_from_device
    with pytest.raises(ValueError, match="FLAT"):
        host_cache_from_device(pcache)


def test_video_chunk_v_engine_bit_equal(setup):
    """RetrievalConfig.video_chunk_v (videos per grid step of the flat
    pallas kernels) threads through BOTH cache build and kernel call and
    is a pure tiling knob: every engine output is bit-equal across values
    (per-video integer/max accumulation is chunk-independent). n_videos=23
    exercises the edge block at chunk 8 (pad to 24) and 16 (pad to 32)."""
    world, builder, model, variables, rcfg, cache, qb = setup
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)

    def run_chunk(chunk):
        ccfg = dataclasses.replace(rcfg, video_score_mode="pallas",
                                   pallas_interpret=True,
                                   video_chunk_v=chunk)
        ccache = encode_corpus(model, variables, builder, world.corpus,
                               ccfg)
        out = _score_query_batch(model, variables, ccfg, qf, qm,
                                 ccache.video_feat1, ccache.video_feat2,
                                 ccache.sub_feat1, ccache.sub_feat2,
                                 ccache.mask, gt, True)
        return {k: np.asarray(v) for k, v in out.items()}

    ref = run_chunk(16)
    out = run_chunk(8)
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)


def test_grouped_shift_engine_matches_grouped(setup):
    """ENGINE-LEVEL contract for span_topk_mode='grouped_shift': the full
    program output is bit-equal to the default grouped expansion."""
    world, builder, model, variables, rcfg, cache, qb = setup
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos, "gather")
    scfg = dataclasses.replace(rcfg, span_topk_mode="grouped_shift")
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    out = _score_query_batch(model, variables, scfg, qf, qm,
                             cache.video_feat1, cache.video_feat2,
                             cache.sub_feat1, cache.sub_feat2,
                             cache.mask, gt, True)
    out = {k: np.asarray(v) for k, v in out.items()}
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)


def test_psort_engine_matches_grouped(setup):
    """ENGINE-LEVEL contract for the lane-parallel-sort parity modes
    (span_topk_mode='grouped_shift_psort' + video_topk_psort): the full
    program output is bit-equal to the default selection paths
    (ops/pallas_sort.py kernel in interpret mode on CPU)."""
    world, builder, model, variables, rcfg, cache, qb = setup
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos, "gather")
    scfg = dataclasses.replace(rcfg, span_topk_mode="grouped_shift_psort",
                               video_topk_psort=True,
                               pallas_interpret=True)
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    out = _score_query_batch(model, variables, scfg, qf, qm,
                             cache.video_feat1, cache.video_feat2,
                             cache.sub_feat1, cache.sub_feat2,
                             cache.mask, gt, True)
    out = {k: np.asarray(v) for k, v in out.items()}
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)


def test_sharded_simsweep_matches_single_device(setup):
    """The sharded engine's simsweep mode must match the single-device
    gather-mode engine (same contract as test_sharded_retrieval)."""
    world, builder, model, variables, rcfg, cache, qb = setup
    if rcfg.cache_dtype_str != "float32":
        pytest.skip("one dtype is enough for the sharded mode check")
    from tvretrieval_tpu.parallel.mesh import make_mesh
    from tvretrieval_tpu.parallel.sharded_retrieval import (
        pad_videos_to_multiple, score_query_batch_sharded)

    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos, "gather")
    mesh = make_mesh(8)
    arrs, _ = pad_videos_to_multiple(
        [cache.video_feat1, cache.video_feat2, cache.sub_feat1,
         cache.sub_feat2, cache.mask], cache.n_videos, 8)
    vf1, vf2, sf1, sf2, mask = [
        jax.device_put(a, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))) for a in arrs]
    scfg = dataclasses.replace(rcfg, span_score_mode="simsweep")
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    out = score_query_batch_sharded(model, variables, scfg, qf, qm,
                                    vf1, vf2, sf1, sf2, mask, gt, True, mesh)
    np.testing.assert_array_equal(np.asarray(out["topv_idx"]), ref["topv_idx"])
    ref_vid_global = np.take_along_axis(ref["topv_idx"],
                                        ref["vcmr_vid_local"], axis=1)
    np.testing.assert_array_equal(np.asarray(out["vcmr_vid_global"]),
                                  ref_vid_global)
    np.testing.assert_array_equal(np.asarray(out["vcmr_st"]), ref["vcmr_st"])
    np.testing.assert_array_equal(np.asarray(out["vcmr_ed"]), ref["vcmr_ed"])
    np.testing.assert_allclose(np.asarray(out["vcmr_scores"]),
                               ref["vcmr_scores"], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["svmr_st"]), ref["svmr_st"])
    np.testing.assert_array_equal(np.asarray(out["svmr_ed"]), ref["svmr_ed"])


def test_sharded_simsweep_cat_int8_matches_single_device_int8(setup):
    """Sharded int8 cat sweep (scales riding the sf2 slot) must match the
    single-device int8 engine EXACTLY on candidate identity: the
    s8 x s8 -> s32 contraction is integer-exact, so per-shard sim values
    are identical to the single-chip values — no f32 accumulation-order
    slack, unlike simsweep_cat."""
    world, builder, model, variables, rcfg, cache, qb = setup
    if rcfg.cache_dtype_str != "float32":
        pytest.skip("one dtype is enough for the sharded mode check")
    from tvretrieval_tpu.ops.pallas_score import quantize_rows_i8
    from tvretrieval_tpu.parallel.mesh import make_mesh
    from tvretrieval_tpu.parallel.sharded_retrieval import (
        pad_videos_to_multiple, score_query_batch_sharded)

    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos,
               "simsweep_cat_int8")
    mesh = make_mesh(8)
    f2c_full = jnp.concatenate([cache.video_feat2, cache.sub_feat2], axis=-1)
    f2c_i8, f2c_scale = quantize_rows_i8(f2c_full)
    arrs, _ = pad_videos_to_multiple(
        [cache.video_feat1, f2c_i8, cache.sub_feat1, f2c_scale, cache.mask],
        cache.n_videos, 8)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    vf1, f2c, sf1, scale, mask = [jax.device_put(a, sh) for a in arrs]
    scfg = dataclasses.replace(rcfg, span_score_mode="simsweep_cat_int8")
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    out = score_query_batch_sharded(model, variables, scfg, qf, qm,
                                    vf1, f2c, sf1, scale, mask, gt,
                                    True, mesh)
    np.testing.assert_array_equal(np.asarray(out["topv_idx"]), ref["topv_idx"])
    ref_vid_global = np.take_along_axis(ref["topv_idx"],
                                        ref["vcmr_vid_local"], axis=1)
    np.testing.assert_array_equal(np.asarray(out["vcmr_vid_global"]),
                                  ref_vid_global)
    np.testing.assert_array_equal(np.asarray(out["vcmr_st"]), ref["vcmr_st"])
    np.testing.assert_array_equal(np.asarray(out["vcmr_ed"]), ref["vcmr_ed"])
    np.testing.assert_allclose(np.asarray(out["vcmr_scores"]),
                               ref["vcmr_scores"], rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(out["svmr_st"]), ref["svmr_st"])
    np.testing.assert_array_equal(np.asarray(out["svmr_ed"]), ref["svmr_ed"])


def test_sharded_simsweep_cat_matches_single_device(setup):
    """Sharded simsweep_cat (feat2_cat riding the vf2 slot, see
    cat_mode_feat2_args) must match the single-device gather-mode engine."""
    world, builder, model, variables, rcfg, cache, qb = setup
    if rcfg.cache_dtype_str != "float32":
        pytest.skip("one dtype is enough for the sharded mode check")
    from tvretrieval_tpu.parallel.mesh import make_mesh
    from tvretrieval_tpu.parallel.sharded_retrieval import (
        pad_videos_to_multiple, score_query_batch_sharded)

    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos, "gather")
    mesh = make_mesh(8)
    feat2_cat = jnp.concatenate([cache.video_feat2, cache.sub_feat2], axis=-1)
    arrs, nv_pad = pad_videos_to_multiple(
        [cache.video_feat1, feat2_cat, cache.sub_feat1, cache.mask],
        cache.n_videos, 8)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    vf1, f2c, sf1, mask = [jax.device_put(a, sh) for a in arrs]
    sf2_dummy = jax.device_put(jnp.zeros((nv_pad, 1, 0), f2c.dtype), sh)
    scfg = dataclasses.replace(rcfg, span_score_mode="simsweep_cat")
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    out = score_query_batch_sharded(model, variables, scfg, qf, qm,
                                    vf1, f2c, sf1, sf2_dummy, mask, gt,
                                    True, mesh)
    np.testing.assert_array_equal(np.asarray(out["topv_idx"]), ref["topv_idx"])
    ref_vid_global = np.take_along_axis(ref["topv_idx"],
                                        ref["vcmr_vid_local"], axis=1)
    np.testing.assert_array_equal(np.asarray(out["vcmr_vid_global"]),
                                  ref_vid_global)
    same = ((np.asarray(out["vcmr_st"]) == ref["vcmr_st"])
            & (np.asarray(out["vcmr_ed"]) == ref["vcmr_ed"]))
    assert same.mean() > 0.99  # fp-tie slack, as in the single-device test
    np.testing.assert_allclose(np.asarray(out["vcmr_scores"]),
                               ref["vcmr_scores"], rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out["svmr_scores"]),
                               ref["svmr_scores"], rtol=2e-5, atol=1e-8)


def test_sharded_video_topk_approx_candidates(setup):
    """Sharded video_topk_approx (per-shard approx_max_k + exact merge):
    on CPU approx_max_k falls back to exact, so the selected VIDEO SET per
    query must equal the exact sharded path's (order may differ — approx
    merge ranks by pre-exp score desc / global idx asc, same keys)."""
    world, builder, model, variables, rcfg, cache, qb = setup
    if rcfg.cache_dtype_str != "float32":
        pytest.skip("one dtype is enough for the sharded mode check")
    from tvretrieval_tpu.parallel.mesh import make_mesh
    from tvretrieval_tpu.parallel.sharded_retrieval import (
        pad_videos_to_multiple, score_query_batch_sharded)

    mesh = make_mesh(8)
    feat2_cat = jnp.concatenate([cache.video_feat2, cache.sub_feat2], axis=-1)
    arrs, nv_pad = pad_videos_to_multiple(
        [cache.video_feat1, feat2_cat, cache.sub_feat1, cache.mask],
        cache.n_videos, 8)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    vf1, f2c, sf1, mask = [jax.device_put(a, sh) for a in arrs]
    sf2_dummy = jax.device_put(jnp.zeros((nv_pad, 1, 0), f2c.dtype), sh)
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    run = lambda cfg: score_query_batch_sharded(
        model, variables, cfg, qf, qm, vf1, f2c, sf1, sf2_dummy, mask, gt,
        True, mesh)
    base = dataclasses.replace(rcfg, span_score_mode="simsweep_cat")
    ref = run(base)
    out = run(dataclasses.replace(base, video_topk_approx=True,
                                  span_topk_mode="grouped_shift_approx"))
    for q in range(np.asarray(ref["topv_idx"]).shape[0]):
        assert (set(np.asarray(out["topv_idx"])[q])
                == set(np.asarray(ref["topv_idx"])[q]))
    # same span candidate sets up to fp-tie slack
    for q in range(np.asarray(ref["vcmr_st"]).shape[0]):
        r = set(zip(np.asarray(ref["vcmr_vid_global"])[q],
                    np.asarray(ref["vcmr_st"])[q],
                    np.asarray(ref["vcmr_ed"])[q]))
        o = set(zip(np.asarray(out["vcmr_vid_global"])[q],
                    np.asarray(out["vcmr_st"])[q],
                    np.asarray(out["vcmr_ed"])[q]))
        assert len(r - o) <= 1 and len(o - r) <= 1


def test_simsweep_cat_int8_flat_close_to_int8(setup):
    """The fused Pallas int8 flat sweep (span_score_mode=
    'simsweep_cat_int8_flat'): video ranking untouched (bit-equal), span
    scores match the XLA int8 mode within the kernel's bf16 similarity
    store + rescale association ((s*qs)*fs vs s*(qs*fs)) — the integer
    dot itself is identical (kernel bit-equal to span_sim_int8_xla,
    tests/test_pallas_score.py)."""
    world, builder, model, variables, rcfg, cache, qb = setup
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos,
               "simsweep_cat_int8")
    out = _run(model, variables, rcfg, cache, qb, cache.n_videos,
               "simsweep_cat_int8_flat")
    np.testing.assert_array_equal(out["topv_idx"], ref["topv_idx"])
    np.testing.assert_array_equal(out["topv_scores"], ref["topv_scores"])
    # bf16 store: rel <= 2^-8 on the similarity; conv mixes signs so give
    # the end-to-end span scores a loose relative band + small atol
    np.testing.assert_allclose(out["vcmr_scores"], ref["vcmr_scores"],
                               rtol=0.1, atol=1e-4)
    same = ((out["vcmr_vid_local"] == ref["vcmr_vid_local"])
            & (out["vcmr_st"] == ref["vcmr_st"])
            & (out["vcmr_ed"] == ref["vcmr_ed"]))
    assert same.mean() > 0.75
    np.testing.assert_allclose(out["svmr_scores"], ref["svmr_scores"],
                               rtol=0.1, atol=1e-4)


def test_simsweep_cat_int8_flat_cache_build_and_retrieve(setup):
    """encode_corpus under span_score_mode='simsweep_cat_int8_flat' stores
    the video-major int8 flat cache ((Nv_pad*128, 2D) + (Nv_pad, 128)
    scales) and the engine consumes it end-to-end with the video ranking
    bit-equal to the gather path."""
    from tvretrieval_tpu.ops.pallas_score import SPAN_LP
    world, builder, model, variables, rcfg, cache, qb = setup
    icfg = dataclasses.replace(rcfg, span_score_mode="simsweep_cat_int8_flat",
                               pallas_interpret=True)
    icache = encode_corpus(model, variables, builder, world.corpus, icfg)
    assert icache.feat2_cat.dtype == jnp.int8
    nv_pad = icache.feat2_cat_scale.shape[0]
    assert nv_pad >= icache.n_videos and nv_pad % 16 == 0
    assert icache.feat2_cat.shape[0] == nv_pad * SPAN_LP
    assert icache.feat2_cat_scale.shape == (nv_pad, SPAN_LP)
    assert icache.video_feat2 is None and icache.sub_feat2 is None
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos, "gather")
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    out = _score_query_batch(model, variables, icfg, qf, qm,
                             icache.video_feat1, icache.video_feat2,
                             icache.sub_feat1, icache.sub_feat2,
                             icache.mask, gt, True,
                             feat2_cat=icache.feat2_cat,
                             feat2_cat_scale=icache.feat2_cat_scale)
    out = {k: np.asarray(v) for k, v in out.items()}
    np.testing.assert_array_equal(out["topv_idx"], ref["topv_idx"])
    np.testing.assert_allclose(out["vcmr_scores"], ref["vcmr_scores"],
                               rtol=0.2, atol=1e-4)


def test_sharded_simsweep_cat_int8_flat_matches_single_device_flat(setup):
    """Sharded fused-Pallas int8 flat sweep: per-shard sim values are
    IDENTICAL to the single-chip flat mode (integer dot + kernel rescale +
    bf16 store are per-video), so the sharded engine matches the
    single-device 'simsweep_cat_int8_flat' output on candidate identity
    and scores."""
    world, builder, model, variables, rcfg, cache, qb = setup
    if rcfg.cache_dtype_str != "float32":
        pytest.skip("one dtype is enough for the sharded mode check")
    from tvretrieval_tpu.ops.pallas_score import build_flat_feat2_i8
    from tvretrieval_tpu.parallel.mesh import make_mesh
    from tvretrieval_tpu.parallel.sharded_retrieval import (
        pad_videos_to_multiple, score_query_batch_sharded)

    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos,
               "simsweep_cat_int8_flat")
    mesh = make_mesh(8)
    chunk_v = 2                      # nv_local = 32/8 = 4, a chunk multiple
    f2c_full = jnp.concatenate([cache.video_feat2, cache.sub_feat2], axis=-1)
    arrs, _ = pad_videos_to_multiple(
        [cache.video_feat1, f2c_full, cache.sub_feat1, cache.mask],
        cache.n_videos, 8 * chunk_v)
    vf1_p, f2c_p, sf1_p, mask_p = arrs
    f8_flat, f_scales = build_flat_feat2_i8(f2c_p, chunk_v=chunk_v)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    vf1, f2c, sf1, scale, mask = [
        jax.device_put(a, sh) for a in (vf1_p, f8_flat, sf1_p, f_scales,
                                        mask_p)]
    scfg = dataclasses.replace(rcfg, span_score_mode="simsweep_cat_int8_flat",
                               pallas_interpret=True)
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    out = score_query_batch_sharded(model, variables, scfg, qf, qm,
                                    vf1, f2c, sf1, scale, mask, gt,
                                    True, mesh)
    np.testing.assert_array_equal(np.asarray(out["topv_idx"]), ref["topv_idx"])
    ref_vid_global = np.take_along_axis(ref["topv_idx"],
                                        ref["vcmr_vid_local"], axis=1)
    np.testing.assert_array_equal(np.asarray(out["vcmr_vid_global"]),
                                  ref_vid_global)
    np.testing.assert_array_equal(np.asarray(out["vcmr_st"]), ref["vcmr_st"])
    np.testing.assert_array_equal(np.asarray(out["vcmr_ed"]), ref["vcmr_ed"])
    np.testing.assert_allclose(np.asarray(out["vcmr_scores"]),
                               ref["vcmr_scores"], rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(out["svmr_st"]), ref["svmr_st"])
    np.testing.assert_array_equal(np.asarray(out["svmr_ed"]), ref["svmr_ed"])


def test_shard_corpus_cache_builds_flat_feat2(setup):
    """shard_corpus_cache with span_score_mode='simsweep_cat_int8_flat'
    pads videos to a mesh*chunk_v multiple and builds the video-major int8
    flat feat2 cache + scales; a pre-flattened cache is rejected."""
    world, builder, model, variables, rcfg, cache, qb = setup
    if rcfg.cache_dtype_str != "float32":
        pytest.skip("one dtype is enough for the cache-build check")
    import copy
    from tvretrieval_tpu.ops.pallas_score import SPAN_LP
    from tvretrieval_tpu.parallel.mesh import make_mesh
    from tvretrieval_tpu.parallel.sharded_retrieval import shard_corpus_cache

    mesh = make_mesh(8)
    fcfg = dataclasses.replace(rcfg, span_score_mode="simsweep_cat_int8_flat",
                               pallas_interpret=True)
    # encode with the plain cat mode (keeps the (Nv, L, 2D) f32 cat cache);
    # shard_corpus_cache builds the per-shard flat layout itself
    ccfg = dataclasses.replace(rcfg, span_score_mode="simsweep_cat")
    c = encode_corpus(model, variables, builder, world.corpus, ccfg)
    c = shard_corpus_cache(c, mesh, cfg=fcfg, chunk_v=2)
    assert c.feat2_cat.dtype == jnp.int8 and c.feat2_cat.ndim == 2
    nv_pad = c.feat2_cat_scale.shape[0]
    assert nv_pad % (8 * 2) == 0
    assert c.feat2_cat.shape[0] == nv_pad * SPAN_LP
    # pre-flattened cache is rejected with a pointer to the right recipe
    cflat = encode_corpus(model, variables, builder, world.corpus, fcfg)
    with pytest.raises(ValueError, match="FLAT single-chip int8 feat2"):
        shard_corpus_cache(copy.copy(cflat), mesh, cfg=fcfg, chunk_v=2)


@pytest.mark.parametrize("vmode", ["pallas", "pallas_int8"])
def test_video_topk_fused_engine_matches_unfused(setup, vmode):
    """ENGINE-LEVEL contract for video_topk_fused=True: the kernel emits
    block maxima, selection runs topk_from_block_max on pre-exp scores —
    outputs must be bit-equal to the same video_score_mode with
    video_topk_pre_exp=True (identical selection semantics), for both the
    bf16/f32 and int8 kernels."""
    world, builder, model, variables, rcfg, cache, qb = setup
    pcfg = dataclasses.replace(rcfg, video_score_mode=vmode,
                               pallas_interpret=True,
                               video_topk_pre_exp=True)
    pcache = encode_corpus(model, variables, builder, world.corpus, pcfg)
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    gt = jnp.asarray(np.arange(qf.shape[0]) % cache.n_videos, jnp.int32)
    run = lambda cfg_: {k: np.asarray(v) for k, v in _score_query_batch(
        model, variables, cfg_, qf, qm,
        pcache.video_feat1, pcache.video_feat2,
        pcache.sub_feat1, pcache.sub_feat2,
        pcache.mask, gt, True).items()}
    ref = run(pcfg)
    out = run(dataclasses.replace(pcfg, video_topk_pre_exp=False,
                                  video_topk_fused=True))
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)


def test_video_topk_fused_with_grouped_shift8_and_external_vr(setup):
    """video_topk_fused composes with span_topk_mode='grouped_shift8'
    (bit-equal to the default grouped path) and is inert under external
    VR (selection comes from the external submission either way)."""
    world, builder, model, variables, rcfg, cache, qb = setup
    pcfg = dataclasses.replace(rcfg, video_score_mode="pallas",
                               pallas_interpret=True)
    pcache = encode_corpus(model, variables, builder, world.corpus, pcfg)
    qf = jnp.asarray(qb.query_feat)
    qm = jnp.asarray(qb.query_mask)
    nq = qf.shape[0]
    gt = jnp.asarray(np.arange(nq) % cache.n_videos, jnp.int32)
    run = lambda cfg_, **kw: {k: np.asarray(v) for k, v in _score_query_batch(
        model, variables, cfg_, qf, qm,
        pcache.video_feat1, pcache.video_feat2,
        pcache.sub_feat1, pcache.sub_feat2,
        pcache.mask, gt, True, **kw).items()}
    ref = run(pcfg)
    out = run(dataclasses.replace(pcfg, video_topk_fused=True,
                                  span_topk_mode="grouped_shift8"))
    for k in ("topv_idx", "vcmr_vid_local", "vcmr_st", "vcmr_ed",
              "svmr_st", "svmr_ed"):
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
    # external VR: identical whether or not fusion is on
    rngx = np.random.default_rng(5)
    V = pcfg.max_vcmr_video
    ext_idx = jnp.asarray(
        np.stack([rngx.permutation(cache.n_videos)[:V] for _ in range(nq)]),
        jnp.int32)
    ext_scores = jnp.asarray(-np.sort(-rngx.random((nq, V))), jnp.float32)
    kw = dict(use_external_vr=True, external_idx=ext_idx,
              external_scores=ext_scores)
    ref_e = run(pcfg, **kw)
    out_e = run(dataclasses.replace(pcfg, video_topk_fused=True), **kw)
    for k in ref_e:
        np.testing.assert_array_equal(out_e[k], ref_e[k], err_msg=k)


def test_tiny_corpus_clamps_max_vcmr_video(setup):
    """Corpora smaller than max_vcmr_video must clamp V to the corpus size
    (the top-k already returns only Nv videos; the st_probs[:, :V] slice
    has to agree — regression for the profiling-CLI shape mismatch)."""
    world, builder, model, variables, rcfg, cache, qb = setup
    big = dataclasses.replace(rcfg, max_vcmr_video=cache.n_videos + 40)
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos, "gather")
    for mode in ("gather", "simsweep_cat"):
        rc = dataclasses.replace(big, span_score_mode=mode)
        out = _run(model, variables, rc, cache, qb, cache.n_videos, mode)
        assert out["topv_idx"].shape[1] == cache.n_videos
        # max_vcmr_video=9 selects the top 9 of the same full ranking:
        # the clamped run's leading candidates cover the reference's videos
        assert set(map(tuple, ref["topv_idx"])) <= set(
            map(tuple, out["topv_idx"][:, :9]))


def test_grouped_shift_approx_engine_candidates(setup):
    """span_topk_mode='grouped_shift_approx' + video_topk_approx: on CPU
    lax.approx_max_k falls back to an exact sort, so the candidate SETS
    must match the exact path (order can differ only at fp ties). Pins the
    plumbing; the on-chip approximation is A/B-contracted separately."""
    world, builder, model, variables, rcfg, cache, qb = setup
    ref = _run(model, variables, rcfg, cache, qb, cache.n_videos, "gather")
    acfg = dataclasses.replace(rcfg, span_topk_mode="grouped_shift_approx",
                               video_topk_approx=True)
    out = _run(model, variables, acfg, cache, qb, cache.n_videos, "gather")
    # same selected videos (set per query; approx ordering may differ)
    for q in range(ref["topv_idx"].shape[0]):
        assert set(out["topv_idx"][q]) == set(ref["topv_idx"][q])
    # same span candidate sets
    for q in range(ref["vcmr_st"].shape[0]):
        r = set(zip(ref["vcmr_vid_local"][q], ref["vcmr_st"][q],
                    ref["vcmr_ed"][q]))
        o = set(zip(out["vcmr_vid_local"][q], out["vcmr_st"][q],
                    out["vcmr_ed"][q]))
        assert len(r - o) <= 1 and len(o - r) <= 1  # fp-tie slack
    np.testing.assert_allclose(np.sort(out["vcmr_scores"], axis=1),
                               np.sort(ref["vcmr_scores"], axis=1),
                               rtol=1e-6, atol=1e-9)

"""Streaming (host-resident corpus) retrieval must match the in-HBM engine."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvretrieval_tpu.data.datasets import ExampleBuilder
from tvretrieval_tpu.data.synthetic import make_synthetic_world
from tvretrieval_tpu.models.xml import XML, XMLConfig
from tvretrieval_tpu.retrieval.engine import (
    RetrievalConfig, _score_query_batch, encode_corpus)
from tvretrieval_tpu.retrieval.streaming import (
    host_cache_from_device, streaming_score_query_batch)


@pytest.fixture(scope="module")
def setup():
    world = make_synthetic_world(n_videos=23, n_queries=10, vid_dim=16,
                                 text_dim=12, max_clips=12, seed=21)
    builder = ExampleBuilder(
        query_source=world.query_source, video_source=world.video_source,
        sub_source=world.sub_source, ctx_mode="video_sub_tef",
        max_desc_l=16, max_ctx_l=12, clip_length=world.clip_length)
    cfg = XMLConfig(ctx_mode="video_sub", visual_input_size=18,
                    sub_input_size=14, query_input_size=16, hidden_size=16,
                    n_heads=4, max_ctx_l=12, max_desc_l=16)
    model = XML(cfg)
    b = builder.build_train_batch(world.annotations[:6])
    batch = {k: jnp.asarray(v) for k, v in b.model_inputs().items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "negatives": jax.random.PRNGKey(2)}, **batch, deterministic=True)
    rcfg = RetrievalConfig(max_vcmr_video=7, max_before_nms=30, min_pred_l=1,
                           max_pred_l=8, context_bsz=8, query_bsz=6)
    cache = encode_corpus(model, variables, builder, world.corpus, rcfg)
    qb = builder.build_query_batch(world.annotations[:6])
    gt = np.arange(6, dtype=np.int32) % len(world.corpus)
    return world, model, variables, rcfg, cache, qb, gt


def test_sharded_streaming_matches_unsharded_streaming(setup):
    """Streaming blocks device_put sharded over an 8-device video mesh must
    reproduce the unsharded streaming engine exactly (the beyond-HBM x
    multi-chip composition)."""
    from tvretrieval_tpu.parallel.mesh import make_mesh
    world, model, variables, rcfg, cache, qb, gt = setup
    host = host_cache_from_device(cache)
    plain = streaming_score_query_batch(
        model, variables, rcfg, qb.query_feat, qb.query_mask, host,
        gt_meta_idx=gt, block_videos=8)
    mesh = make_mesh(8)
    sharded = streaming_score_query_batch(
        model, variables, rcfg, qb.query_feat, qb.query_mask, host,
        gt_meta_idx=gt, block_videos=8, mesh=mesh)
    for k in plain:
        if plain[k].dtype.kind == "i":
            np.testing.assert_array_equal(sharded[k], plain[k], err_msg=k)
        else:
            np.testing.assert_allclose(sharded[k], plain[k], rtol=1e-6,
                                       err_msg=k)


def test_streaming_matches_in_hbm_engine():
    world = make_synthetic_world(n_videos=23, n_queries=10, vid_dim=16,
                                 text_dim=12, max_clips=12, seed=21)
    builder = ExampleBuilder(
        query_source=world.query_source, video_source=world.video_source,
        sub_source=world.sub_source, ctx_mode="video_sub_tef",
        max_desc_l=16, max_ctx_l=12, clip_length=world.clip_length)
    cfg = XMLConfig(ctx_mode="video_sub", visual_input_size=18,
                    sub_input_size=14, query_input_size=16, hidden_size=16,
                    n_heads=4, max_ctx_l=12, max_desc_l=16)
    model = XML(cfg)
    b = builder.build_train_batch(world.annotations[:6])
    batch = {k: jnp.asarray(v) for k, v in b.model_inputs().items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "negatives": jax.random.PRNGKey(2)}, **batch, deterministic=True)

    rcfg = RetrievalConfig(max_vcmr_video=7, max_before_nms=30, min_pred_l=1,
                           max_pred_l=8, context_bsz=8, query_bsz=6)
    cache = encode_corpus(model, variables, builder, world.corpus, rcfg)
    qb = builder.build_query_batch(world.annotations[:6])
    gt = np.arange(6, dtype=np.int32) % len(world.corpus)

    ref = _score_query_batch(model, variables, rcfg,
                             jnp.asarray(qb.query_feat), jnp.asarray(qb.query_mask),
                             cache.video_feat1, cache.video_feat2,
                             cache.sub_feat1, cache.sub_feat2,
                             cache.mask, jnp.asarray(gt), True)

    host = host_cache_from_device(cache)
    out = streaming_score_query_batch(
        model, variables, rcfg, qb.query_feat, qb.query_mask, host,
        gt_meta_idx=gt, block_videos=8)  # 3 blocks incl. a padded one

    # top-V videos identical (as sets; merge tie-order may differ)
    for q in range(6):
        assert (set(out["topv_idx"][q].tolist())
                == set(np.asarray(ref["topv_idx"])[q].tolist())), q
    np.testing.assert_allclose(np.sort(out["topv_scores"], axis=1),
                               np.sort(np.asarray(ref["topv_scores"]), axis=1),
                               rtol=1e-5)

    # VCMR spans: same scores; same (video, st, ed) candidate sets
    np.testing.assert_allclose(out["vcmr_scores"],
                               np.asarray(ref["vcmr_scores"]), rtol=1e-5)
    ref_vid_global = np.take_along_axis(np.asarray(ref["topv_idx"]),
                                        np.asarray(ref["vcmr_vid_local"]), axis=1)
    out_vid_global = np.take_along_axis(out["topv_idx"], out["vcmr_vid_local"],
                                        axis=1)
    for q in range(6):
        ref_set = set(zip(ref_vid_global[q].tolist(),
                          np.asarray(ref["vcmr_st"])[q].tolist(),
                          np.asarray(ref["vcmr_ed"])[q].tolist()))
        out_set = set(zip(out_vid_global[q].tolist(),
                          out["vcmr_st"][q].tolist(),
                          out["vcmr_ed"][q].tolist()))
        assert len(ref_set & out_set) >= int(0.95 * len(ref_set)), q

    # SVMR identical
    np.testing.assert_allclose(out["svmr_scores"],
                               np.asarray(ref["svmr_scores"]), rtol=1e-5)
    np.testing.assert_array_equal(out["svmr_st"], np.asarray(ref["svmr_st"]))


def test_streaming_flat_kernel_matches_einsum_blocks(setup):
    """flat=True (per-block Pallas flat-kernel scoring, interpret on CPU)
    + grouped_shift span top-k must reproduce the einsum-block streaming
    engine bit-for-bit — the kernel is bit-equal per video, pad videos are
    restored to the exact -1e10 masked-einsum value, and grouped_shift is
    bit-equal to grouped (round-3: scale paths inherit the round-2 wins)."""
    import dataclasses

    world, model, variables, rcfg, cache, qb, gt = setup
    host = host_cache_from_device(cache)
    ref = streaming_score_query_batch(
        model, variables, rcfg, qb.query_feat, qb.query_mask, host,
        gt_meta_idx=gt, block_videos=16)  # 23 videos -> a padded block

    fcfg = dataclasses.replace(rcfg, pallas_interpret=True,
                               span_topk_mode="grouped_shift")
    fhost = host_cache_from_device(cache, flat=True)
    assert fhost.flat and fhost.video_feat1.ndim == 2
    out = streaming_score_query_batch(
        model, variables, fcfg, qb.query_feat, qb.query_mask, fhost,
        gt_meta_idx=gt, block_videos=16)
    for k in ref:
        if ref[k].dtype.kind == "i":
            np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
        else:
            np.testing.assert_array_equal(out[k], ref[k], err_msg=k)


def test_streaming_flat_sharded_matches_unsharded(setup):
    """flat blocks sharded over the 8-device mesh (per-shard kernel under
    shard_map) == unsharded flat streaming."""
    import dataclasses

    from tvretrieval_tpu.parallel.mesh import make_mesh

    world, model, variables, rcfg, cache, qb, gt = setup
    fcfg = dataclasses.replace(rcfg, pallas_interpret=True)
    fhost = host_cache_from_device(cache, flat=True)
    plain = streaming_score_query_batch(
        model, variables, fcfg, qb.query_feat, qb.query_mask, fhost,
        gt_meta_idx=gt, block_videos=16)
    mesh = make_mesh(8)
    sharded = streaming_score_query_batch(
        model, variables, fcfg, qb.query_feat, qb.query_mask, fhost,
        gt_meta_idx=gt, block_videos=16, mesh=mesh)  # rounds to 128/block
    for k in plain:
        np.testing.assert_array_equal(sharded[k], plain[k], err_msg=k)


def test_streaming_int8_blocks_match_in_hbm_int8_engine(setup):
    """int8 host blocks (half host RAM + half host->device bytes) must
    reproduce the in-HBM engine's video_score_mode='pallas_int8' VIDEO
    ranking: identical quantized inputs + integer-exact dots give
    identical q2c values, so the sorted top-V scores agree exactly
    (per-index identity is asserted score-wise to stay robust to
    cross-video ties, which coarse integer scores can produce)."""
    import dataclasses

    from tvretrieval_tpu.ops.pallas_score import (
        build_flat_feat1, flat_lp, quantize_unit_i8, video_scores_int8_xla)

    world, model, variables, rcfg, cache, qb, gt = setup
    fcfg = dataclasses.replace(rcfg, pallas_interpret=True)
    ihost = host_cache_from_device(cache, flat=True, int8=True)
    assert ihost.int8 and ihost.video_feat1.dtype == np.int8
    out = streaming_score_query_batch(
        model, variables, fcfg, qb.query_feat, qb.query_mask, ihost,
        gt_meta_idx=gt, block_videos=16)

    # integer-exact reference q2c on the SAME quantized cache
    lp = flat_lp(cache.mask.shape[1])
    fv = quantize_unit_i8(build_flat_feat1(cache.video_feat1, cache.mask))
    fs = quantize_unit_i8(build_flat_feat1(cache.sub_feat1, cache.mask))
    # host (numpy) quantization must be bit-identical to the device one
    np.testing.assert_array_equal(
        ihost.video_feat1, np.asarray(fv)[: ihost.video_feat1.shape[0]])
    from tvretrieval_tpu.retrieval.streaming import _encode_queries
    _, _, vqn, sqn = _encode_queries(model, variables,
                                     jnp.asarray(qb.query_feat),
                                     jnp.asarray(qb.query_mask))
    q2c = np.asarray(video_scores_int8_xla(
        quantize_unit_i8(vqn), quantize_unit_i8(sqn), fv, fs,
        cache.n_videos, lp=lp))
    V = rcfg.max_vcmr_video
    ref_sorted = -np.sort(-q2c, axis=1)[:, :V]
    got_cos = np.log(out["topv_scores"]) / rcfg.q2c_alpha
    np.testing.assert_allclose(got_cos, ref_sorted, rtol=1e-5, atol=1e-7)
    # each selected video's score equals the reference q2c at that index
    sel = np.take_along_axis(q2c, out["topv_idx"], axis=1)
    np.testing.assert_allclose(got_cos, sel, rtol=1e-5, atol=1e-7)


def test_streaming_int8_sharded_matches_unsharded(setup):
    """int8 blocks sharded over the 8-device mesh == unsharded int8
    streaming, bit-for-bit (integer dots are accumulation-order free)."""
    import dataclasses

    from tvretrieval_tpu.parallel.mesh import make_mesh

    world, model, variables, rcfg, cache, qb, gt = setup
    fcfg = dataclasses.replace(rcfg, pallas_interpret=True)
    ihost = host_cache_from_device(cache, flat=True, int8=True)
    plain = streaming_score_query_batch(
        model, variables, fcfg, qb.query_feat, qb.query_mask, ihost,
        gt_meta_idx=gt, block_videos=16)
    mesh = make_mesh(8)
    sharded = streaming_score_query_batch(
        model, variables, fcfg, qb.query_feat, qb.query_mask, ihost,
        gt_meta_idx=gt, block_videos=16, mesh=mesh)
    for k in plain:
        np.testing.assert_array_equal(sharded[k], plain[k], err_msg=k)


def test_host_cache_int8_requires_flat(setup):
    world, model, variables, rcfg, cache, qb, gt = setup
    with pytest.raises(ValueError, match="flat"):
        host_cache_from_device(cache, flat=False, int8=True)


def test_streaming_flat_bf16_cache(setup):
    """bf16 host cache streams through the flat kernel (halved host->HBM
    transfer per block) and matches the bf16 einsum-block path exactly."""
    import dataclasses

    world, model, variables, rcfg, cache, qb, gt = setup
    bcfg = dataclasses.replace(rcfg, cache_dtype_str="bfloat16")
    from tvretrieval_tpu.retrieval.engine import encode_corpus as enc
    from tvretrieval_tpu.data.datasets import ExampleBuilder
    builder = ExampleBuilder(
        query_source=world.query_source, video_source=world.video_source,
        sub_source=world.sub_source, ctx_mode="video_sub_tef",
        max_desc_l=16, max_ctx_l=12, clip_length=world.clip_length)
    bcache = enc(model, variables, builder, world.corpus, bcfg)
    ref = streaming_score_query_batch(
        model, variables, bcfg, qb.query_feat, qb.query_mask,
        host_cache_from_device(bcache), gt_meta_idx=gt, block_videos=16)
    fcfg = dataclasses.replace(bcfg, pallas_interpret=True)
    out = streaming_score_query_batch(
        model, variables, fcfg, qb.query_feat, qb.query_mask,
        host_cache_from_device(bcache, flat=True), gt_meta_idx=gt,
        block_videos=16)
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)

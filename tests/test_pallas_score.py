"""The fused Pallas video-score kernel must match the engine's XLA einsum
path (reference op: model_xml.py:436-453 over the whole corpus,
inference.py:308-317)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tvretrieval_tpu.ops.pallas_score import video_scores_pallas, video_scores_xla


def _case(nq, nv, l, d, dtype, seed, masked_tail=True):
    rng = np.random.default_rng(seed)
    norm = lambda x: x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    qv = norm(rng.normal(size=(nq, d)).astype(np.float32))
    qs = norm(rng.normal(size=(nq, d)).astype(np.float32))
    fv = norm(rng.normal(size=(nv, l, d)).astype(np.float32))
    fs = norm(rng.normal(size=(nv, l, d)).astype(np.float32))
    mask = np.ones((nv, l), np.float32)
    if masked_tail:
        lengths = rng.integers(1, l + 1, size=nv)
        mask = (np.arange(l)[None] < lengths[:, None]).astype(np.float32)
    cast = lambda x: jnp.asarray(x).astype(dtype)
    return (cast(qv), cast(qs), cast(fv), cast(fs), jnp.asarray(mask))


@pytest.mark.parametrize("nq,nv,l,d,chunk_v", [
    (6, 37, 12, 16, 8),      # Nv not a multiple of chunk_v (edge block)
    (4, 64, 20, 32, 16),
    (3, 16, 7, 8, 16),       # single partial grid step
])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_scores_match_xla(nq, nv, l, d, chunk_v, dtype):
    qv, qs, fv, fs, mask = _case(nq, nv, l, d, dtype, seed=nq * 10 + nv)
    ref = video_scores_xla(qv, qs, fv, fs, mask)
    out = video_scores_pallas(qv, qs, fv, fs, mask,
                              chunk_v=chunk_v, interpret=True)
    assert out.shape == ref.shape == (nq, nv)
    # same f32-accumulated dots, same mask algebra, order-exact max/avg
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_all_masked_video_scores_neg_inf():
    qv, qs, fv, fs, mask = _case(3, 24, 10, 16, jnp.float32, seed=9,
                                 masked_tail=False)
    mask = mask.at[5].set(0.0)  # a fully padded video slot
    ref = video_scores_xla(qv, qs, fv, fs, mask)
    out = video_scores_pallas(qv, qs, fv, fs, mask, chunk_v=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert np.all(np.asarray(out)[:, 5] == -1e10)


@pytest.mark.parametrize("nq,nv,l,d,lp,chunk_v", [
    (6, 37, 12, 16, 16, 8),    # Nv padded up to a chunk_v multiple
    (4, 64, 20, 32, 24, 16),
    (3, 16, 7, 8, 8, 4),       # lp == 8 minimum
])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flat_kernel_matches_xla(nq, nv, l, d, lp, chunk_v, dtype):
    """The v2 flat mask-free kernel (one big dot per stream per tile,
    masked/pad rows duplicated from clip 0) is bit-equal to the einsum
    path — prefix masks with >=1 valid clip per video, the single-chip
    engine's invariant."""
    from tvretrieval_tpu.ops.pallas_score import (build_flat_feat1,
                                                  video_scores_pallas_flat)
    qv, qs, fv, fs, mask = _case(nq, nv, l, d, dtype, seed=nq * 7 + nv)
    ref = video_scores_xla(qv, qs, fv, fs, mask)
    fvf = build_flat_feat1(fv, mask, lp=lp, chunk_v=chunk_v)
    fsf = build_flat_feat1(fs, mask, lp=lp, chunk_v=chunk_v)
    nv_pad = -(-nv // chunk_v) * chunk_v
    assert fvf.shape == (nv_pad * lp, d) and fvf.dtype == dtype
    out = video_scores_pallas_flat(qv.T, qs.T, fvf, fsf, nv,
                                   lp=lp, chunk_v=chunk_v, interpret=True)
    assert out.shape == (nq, nv)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_flat_kernel_non_prefix_mask_exact():
    """The first-valid-clip fill makes the flat cache exact for ANY mask
    with >= 1 valid clip per video, prefix or not."""
    from tvretrieval_tpu.ops.pallas_score import (build_flat_feat1,
                                                  video_scores_pallas_flat)
    qv, qs, fv, fs, _ = _case(5, 24, 12, 16, jnp.float32, seed=3,
                              masked_tail=False)
    rng = np.random.default_rng(11)
    mask = (rng.random((24, 12)) < 0.5).astype(np.float32)
    mask[:, 3] = 1.0  # guarantee one valid clip per video (not clip 0)
    mask[:, 0] = 0.0  # clip 0 masked everywhere: the fill must use argmax
    mask = jnp.asarray(mask)
    ref = video_scores_xla(qv, qs, fv, fs, mask)
    fvf = build_flat_feat1(fv, mask, lp=16, chunk_v=8)
    fsf = build_flat_feat1(fs, mask, lp=16, chunk_v=8)
    out = video_scores_pallas_flat(qv.T, qs.T, fvf, fsf, 24,
                                   lp=16, chunk_v=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_flat_cache_rejects_fully_masked_video():
    """A video with zero valid clips scores -1e10 on the mask path but
    cannot be represented mask-free — the builder must refuse it."""
    from tvretrieval_tpu.ops.pallas_score import build_flat_feat1
    _, _, fv, _, mask = _case(3, 16, 8, 8, jnp.float32, seed=5,
                              masked_tail=False)
    mask = mask.at[4].set(0.0)
    with pytest.raises(ValueError, match="no valid clip"):
        build_flat_feat1(fv, mask, lp=8, chunk_v=8)


@pytest.mark.parametrize("nq,nv,l,d,lp,chunk_v", [
    (6, 37, 12, 16, 16, 8),
    (3, 16, 7, 8, 8, 4),
])
def test_int8_kernel_bit_equal_to_int8_xla(nq, nv, l, d, lp, chunk_v):
    """The s8 kernel's integer accumulation and max are EXACT: bit-equal
    to the XLA int32 reference on the same quantized inputs (the only
    approximation in video_score_mode='pallas_int8' is the quantization
    itself, bounded below)."""
    from tvretrieval_tpu.ops.pallas_score import (
        build_flat_feat1, quantize_unit_i8, video_scores_int8_xla,
        video_scores_pallas_flat_i8)
    qv, qs, fv, fs, mask = _case(nq, nv, l, d, jnp.float32, seed=nq + nv)
    fvf = quantize_unit_i8(build_flat_feat1(fv, mask, lp=lp, chunk_v=chunk_v))
    fsf = quantize_unit_i8(build_flat_feat1(fs, mask, lp=lp, chunk_v=chunk_v))
    qv8, qs8 = quantize_unit_i8(qv), quantize_unit_i8(qs)
    ref = video_scores_int8_xla(qv8, qs8, fvf, fsf, nv, lp=lp)
    out = video_scores_pallas_flat_i8(qv8.T, qs8.T, fvf, fsf, nv,
                                      lp=lp, chunk_v=chunk_v, interpret=True)
    assert out.dtype == jnp.float32 and out.shape == (nq, nv)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_int8_quantization_error_bound():
    """Quantized cosine scores stay within the documented error budget of
    the exact f32 path: per-component error <= 1/254 on unit-norm rows
    gives |err| <~ 2 * sqrt(D) / 254 worst-case; assert a 0.02 ceiling and
    a much tighter mean (std model: sqrt(2/3)/254 ~ 0.0032)."""
    from tvretrieval_tpu.ops.pallas_score import (
        build_flat_feat1, quantize_unit_i8, video_scores_int8_xla)
    nq, nv, l, d, lp = 16, 64, 10, 64, 16
    qv, qs, fv, fs, mask = _case(nq, nv, l, d, jnp.float32, seed=123)
    ref = video_scores_xla(qv, qs, fv, fs, mask)
    fvf = quantize_unit_i8(build_flat_feat1(fv, mask, lp=lp, chunk_v=8))
    fsf = quantize_unit_i8(build_flat_feat1(fs, mask, lp=lp, chunk_v=8))
    out = video_scores_int8_xla(quantize_unit_i8(qv), quantize_unit_i8(qs),
                                fvf, fsf, nv, lp=lp)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 0.02, err.max()
    assert err.mean() < 0.005, err.mean()


@pytest.mark.parametrize("nq,nv,l,d2,lp,chunk_v,q_tile", [
    (6, 37, 12, 32, 128, 8, 128),   # Nv not a chunk_v multiple, q pad 6->32
    (5, 16, 20, 64, 128, 16, 32),   # single video chunk, tiny q tile
    (40, 24, 14, 48, 256, 8, 32),   # several q tiles, lp > 128
    (3, 9, 7, 16, 128, 3, 100),     # non-32-aligned q_tile (rounded up)
])
def test_span_sim_int8_kernel_bit_equal_to_xla(nq, nv, l, d2, lp, chunk_v,
                                               q_tile):
    """The fused int8 cat span-sweep kernel (span_sim_pallas_cat_i8) is
    bit-equal to the XLA integer reference (span_sim_int8_xla): same s32
    integer dot, same (s * q_scale) * f_scale f32 rescale association,
    same bf16 store — over non-aligned Nq/Nv/L shapes."""
    from tvretrieval_tpu.ops.pallas_score import (
        build_flat_feat2_i8, quantize_rows_i8, span_sim_int8_xla,
        span_sim_pallas_cat_i8)
    rng = np.random.default_rng(nq * 100 + nv)
    feat2 = rng.normal(size=(nv, l, d2)).astype(np.float32) * 3.0
    f8_flat, f_scales = build_flat_feat2_i8(jnp.asarray(feat2), lp=lp,
                                            chunk_v=chunk_v)
    qcat = rng.normal(size=(nq, d2)).astype(np.float32)
    q8, q_scale = quantize_rows_i8(jnp.asarray(qcat))
    q_scale = q_scale[:, None]
    ref = span_sim_int8_xla(q8, q_scale, f8_flat, f_scales, lp=lp)
    out = span_sim_pallas_cat_i8(q8, q_scale, f8_flat, f_scales, lp=lp,
                                 chunk_v=chunk_v, q_tile=q_tile,
                                 interpret=True)
    assert out.shape == ref.shape == (nq, f8_flat.shape[0] // lp, lp)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # L -> lp pad rows are exact zeros (sliced off after the row gather)
    assert np.all(np.asarray(out)[:, :, l:] == 0)


def test_span_sim_kernel_rejects_bad_lp():
    from tvretrieval_tpu.ops.pallas_score import (build_flat_feat2_i8,
                                                  span_sim_pallas_cat_i8)
    feat2 = jnp.zeros((4, 10, 16), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 128"):
        build_flat_feat2_i8(feat2, lp=104)
    q8 = jnp.zeros((2, 16), jnp.int8)
    qs = jnp.ones((2, 1), jnp.float32)
    f8 = jnp.zeros((4 * 104, 16), jnp.int8)
    fs = jnp.ones((4, 104), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 128"):
        span_sim_pallas_cat_i8(q8, qs, f8, fs, lp=104, chunk_v=4,
                               interpret=True)


@pytest.mark.parametrize("int8", [False, True])
def test_flat_bmax_kernel_matches_plain_kernel(int8):
    """video_scores_pallas_flat_bmax: scores[:, :n_videos] bit-equal to the
    plain flat kernel, pad videos masked to -inf, and bmax is the exact
    per-chunk maximum of the padded score matrix."""
    from tvretrieval_tpu.ops.pallas_score import (
        build_flat_feat1, quantize_unit_i8, video_scores_pallas_flat,
        video_scores_pallas_flat_bmax, video_scores_pallas_flat_i8)
    nq, nv, l, d, chunk_v = 5, 21, 12, 16, 8
    lp = 16
    qv, qs, fv, fs, mask = _case(nq, nv, l, d, jnp.float32, seed=3)
    fvf = build_flat_feat1(fv, mask, lp=lp, chunk_v=chunk_v)
    fsf = build_flat_feat1(fs, mask, lp=lp, chunk_v=chunk_v)
    if int8:
        fvf, fsf = quantize_unit_i8(fvf), quantize_unit_i8(fsf)
        qvt, qst = quantize_unit_i8(qv).T, quantize_unit_i8(qs).T
        ref = video_scores_pallas_flat_i8(qvt, qst, fvf, fsf, n_videos=nv,
                                          lp=lp, chunk_v=chunk_v,
                                          interpret=True)
    else:
        qvt, qst = qv.T, qs.T
        ref = video_scores_pallas_flat(qvt, qst, fvf, fsf, n_videos=nv,
                                       lp=lp, chunk_v=chunk_v,
                                       interpret=True)
    scores, bmax = video_scores_pallas_flat_bmax(
        qvt, qst, fvf, fsf, n_videos=nv, lp=lp, chunk_v=chunk_v,
        interpret=True)
    nv_pad = fvf.shape[0] // lp
    assert scores.shape == (nq, nv_pad)
    assert bmax.shape == (nq, nv_pad // chunk_v)
    np.testing.assert_array_equal(np.asarray(scores)[:, :nv],
                                  np.asarray(ref))
    assert np.all(np.asarray(scores)[:, nv:] == -np.inf)
    expect_bmax = np.asarray(scores).reshape(nq, -1, chunk_v).max(axis=2)
    np.testing.assert_array_equal(np.asarray(bmax), expect_bmax)


def test_topk_from_block_max_bit_equal_to_blocked():
    """topk_from_block_max on (kernel-style -inf-padded scores, exact block
    maxima) is bit-equal to topk_stable_blocked on the unpadded row —
    including heavy exact ties."""
    from tvretrieval_tpu.ops.span import (topk_from_block_max,
                                          topk_stable_blocked)
    rng = np.random.default_rng(11)
    for n, k, block, ties in [(2100, 100, 16, False), (333, 100, 16, True),
                              (120, 100, 8, False)]:
        x = rng.random((6, n)).astype(np.float32)
        if ties:
            x = np.round(x * 4) / 4
        pad = (-n) % block
        xp = np.pad(x, ((0, 0), (0, pad)), constant_values=-np.inf)
        bmax = xp.reshape(6, -1, block).max(axis=2)
        rv, ri = topk_stable_blocked(jnp.asarray(x), k, block=block)
        gv, gi = topk_from_block_max(jnp.asarray(xp), jnp.asarray(bmax), k,
                                     block=block)
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))

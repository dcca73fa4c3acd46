"""Fused corpus video-scoring Pallas TPU kernels (q2c cosine stage).

Reference op being replaced: model_xml.py:436-453 (``get_video_level_scores``:
einsum("md,nld->mln") -> mask_logits -> max over clips) run against the
ENTIRE corpus per query batch (inference.py:308-317). The XLA path
materializes two (Nq, L, Nv) f32 similarity tensors in HBM plus mask/max
passes; these kernels stream the feat1 caches through VMEM once and write
only the (Nv, Nq) score matrix.

Two generations live here:

* ``video_scores_pallas`` (v1, superseded): per grid step, 2 x chunk_v
  small (Nq, D) x (D, L) dots + in-VMEM mask/max. Measured ~3.5x off the
  MXU roofline at corpus scale (43 ms at Nq=800) — N=100 under-fills the
  128-lane MXU and every small dot pays pipeline startup. Kept as the
  documented design study.
* ``video_scores_pallas_flat`` (v2, the engine's ``video_score_mode=
  "pallas"``): consumes a video-major FLAT cache (``build_flat_feat1``)
  so each step is ONE large (chunk_v*lp, D) x (D, Nq) dot per stream and
  the per-video max is a free tiled reshape + sublane segment max; the
  mask disappears at cache build (masked/pad rows duplicate a valid clip
  row — a duplicate can never change a max). 14.5 ms at Nq=800, at the
  cache-read + dot roofline.

Exactness: the same D-length f32-accumulated dots and order-exact
max/average — both kernels are bit-equal to the XLA einsum path (pinned
by tests/test_pallas_score.py; v2 also verified bit-equal ON CHIP at
full corpus scale with random prefix masks). exp(alpha * q2c) is
deliberately left to XLA so the kernels introduce no
transcendental-implementation difference.

Queries must be pre-normalized and pre-cast to the cache dtype by the
caller (the engine normalizes once per batch; feat1 is pre-normalized at
cache build — engine.encode_corpus).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvretrieval_tpu.ops.masking import NEG_INF


def _score_kernel(qv_ref, qs_ref, fv_ref, fs_ref, mask_ref, out_ref, *,
                  chunk_v: int):
    qv = qv_ref[...]                      # (Nq, D) cache dtype
    qs = qs_ref[...]
    dn = (((1,), (1,)), ((), ()))         # contract D: A @ B^T
    for v in range(chunk_v):
        fv = fv_ref[v]                    # (L, D)
        fs = fs_ref[v]
        m = mask_ref[v, :][None, :]       # (1, L) f32
        sv = jax.lax.dot_general(qv, fv, dn,
                                 preferred_element_type=jnp.float32)
        ss = jax.lax.dot_general(qs, fs, dn,
                                 preferred_element_type=jnp.float32)
        sv = sv * m + (1.0 - m) * NEG_INF
        ss = ss * m + (1.0 - m) * NEG_INF
        out_ref[v, :] = (jnp.max(sv, axis=-1) + jnp.max(ss, axis=-1)) / 2


@functools.partial(jax.jit, static_argnames=("chunk_v", "interpret"))
def video_scores_pallas(qv, qs, feat1_v, feat1_s, mask,
                        chunk_v: int = 16, interpret: bool = False):
    """Fused corpus q2c scores.

    Args:
        qv/qs: (Nq, D) L2-normalized modular query vectors, already cast to
            the cache dtype (bit-parity with the engine einsum path).
        feat1_v/feat1_s: (Nv, L, D) pre-normalized retrieval-stream caches.
        mask: (Nv, L) float {0,1} clip validity.
    Returns:
        (Nq, Nv) f32 q2c scores (pre-exp; engine applies exp(alpha * q2c)).
    """
    nv, l, d = feat1_v.shape
    nq = qv.shape[0]
    grid = (pl.cdiv(nv, chunk_v),)
    out = pl.pallas_call(
        functools.partial(_score_kernel, chunk_v=chunk_v),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_v, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_v, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_v, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk_v, nq), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nv, nq), jnp.float32),
        interpret=interpret,
    )(qv, qs, feat1_v, feat1_s, mask)
    return out.T                           # (Nq, Nv)


def _score_kernel_flat(qvt_ref, qst_ref, fv_ref, fs_ref, out_ref, *,
                       chunk_v: int, lp: int):
    """One grid step: TWO large MXU dots (one per stream) over a
    (chunk_v * lp, D) video-major flat feature block, then a segment max
    over each video's lp rows — no per-video small-dot loop (the v1 kernel
    issued 2 x chunk_v tiny (Nq, D) x (D, L) dots per step and measured
    ~3.5x off the MXU roofline at corpus scale)."""
    dn = (((1,), (0,)), ((), ()))          # (M, D) x (D, Nq) -> (M, Nq)
    nq = qvt_ref.shape[1]

    sv = jax.lax.dot_general(fv_ref[...], qvt_ref[...], dn,
                             preferred_element_type=jnp.float32)
    ss = jax.lax.dot_general(fs_ref[...], qst_ref[...], dn,
                             preferred_element_type=jnp.float32)
    # (chunk_v * lp, Nq) -> (chunk_v, lp, Nq): splits the sublane dim at
    # lp (a multiple of 8), so the reshape is a free tiled view
    mv = sv.reshape(chunk_v, lp, nq).max(axis=1)
    ms = ss.reshape(chunk_v, lp, nq).max(axis=1)
    out_ref[...] = (mv + ms) / 2


def flat_lp(L: int) -> int:
    """Row count per video in the flat cache: L rounded up to a multiple
    of 8 (the sublane tile), so the kernel's (chunk_v*lp, Nq) ->
    (chunk_v, lp, Nq) reshape is a free tiled view for any max_ctx_l."""
    return -(-L // 8) * 8


@functools.partial(jax.jit, static_argnames=("n_videos", "lp", "chunk_v",
                                             "interpret"))
def video_scores_pallas_flat(qvt, qst, fv_flat, fs_flat, n_videos: int,
                             lp: int = 104, chunk_v: int = 16,
                             interpret: bool = False):
    """Fused corpus q2c scores over FLAT mask-free feature caches.

    Args:
        qvt/qst: (D, Nq) transposed L2-normalized modular query vectors,
            cast to the cache dtype.
        fv_flat/fs_flat: (Nv_pad * lp, D) video-major flat caches from
            :func:`build_flat_feat1` — masked / length-pad rows hold a COPY
            of a valid clip's features (a duplicate row can never change
            the per-video max), pad videos replicate the last real video
            (sliced off below).
        n_videos: true video count (Nv_pad = fv_flat.shape[0] // lp).
        lp: rows per video — must equal the ``flat_lp(L)`` used at cache
            build (the engine passes ``flat_lp(ctx_mask.shape[1])``).
    Returns:
        (Nq, n_videos) f32 q2c scores — bit-equal to the einsum/mask path
        (tests/test_pallas_score.py).
    """
    rows, d = fv_flat.shape
    nv_pad = rows // lp
    assert nv_pad * lp == rows
    # chunk_v is an UPPER BOUND (cf. span_sim_pallas_cat_i8): small shards
    # (sharded engine per-device slices) may hold fewer videos than the
    # default chunk; fall back to the largest divisor of nv_pad
    import math
    chunk_v = math.gcd(nv_pad, chunk_v)
    nq = qvt.shape[1]
    grid = (nv_pad // chunk_v,)
    out = pl.pallas_call(
        functools.partial(_score_kernel_flat, chunk_v=chunk_v, lp=lp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_v * lp, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_v * lp, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk_v, nq), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nv_pad, nq), jnp.float32),
        interpret=interpret,
    )(qvt, qst, fv_flat, fs_flat)
    return out.T[:, :n_videos]


@functools.partial(jax.jit, static_argnames=("lp", "chunk_v"))
def _build_flat_feat1(feat1, mask, lp: int, chunk_v: int):
    nv, L, d = feat1.shape
    # fill masked clips and the L -> lp pad with each video's FIRST VALID
    # clip row (argmax of the mask gives the first 1) — exact for any mask
    # with >= 1 valid clip, prefix or not: a duplicated valid row can never
    # change the per-video max
    first_valid = jnp.argmax(mask > 0, axis=1)                   # (Nv,)
    fill = jnp.take_along_axis(feat1, first_valid[:, None, None], axis=1)
    fixed = jnp.where(mask[:, :, None] > 0, feat1, fill)
    if lp > L:
        pad = jnp.broadcast_to(fill, (nv, lp - L, d)).astype(fixed.dtype)
        fixed = jnp.concatenate([fixed, pad], axis=1)
    pad_v = (-nv) % chunk_v
    if pad_v:
        fixed = jnp.concatenate(
            [fixed, jnp.broadcast_to(fixed[-1:], (pad_v, lp, d))], axis=0)
    return fixed.reshape((nv + pad_v) * lp, d)


def build_flat_feat1(feat1, mask, lp: int | None = None, chunk_v: int = 16,
                     check: bool = True):
    """(Nv, L, D) feat1 + (Nv, L) mask -> mask-free (Nv_pad * lp, D) flat
    cache for :func:`video_scores_pallas_flat` (one-time, at cache build).

    Masked clips and the L -> lp length pad are filled with each video's
    first VALID clip row, so the kernel's per-video max needs no mask;
    extra videos up to a chunk_v multiple replicate the last real video
    and are sliced off the output. lp defaults to ``flat_lp(L)``.

    check=True (one host sync, cache build is one-time) raises if any
    video has zero valid clips — such a video would score a real cosine
    max here but -1e10 on the einsum/mask path. Fully-masked rows only
    arise from video-axis padding, which the single-chip engine never
    does (the sharded engine pads but uses the einsum path).
    """
    nv, L, d = feat1.shape
    if lp is None:
        lp = flat_lp(L)
    if not (lp % 8 == 0 and lp >= L):
        raise ValueError(f"lp={lp} must be >= L={L} and a multiple of 8")
    if check and not bool(jnp.all(jnp.max(mask, axis=1) > 0)):
        raise ValueError(
            "build_flat_feat1: some video has no valid clip; the mask-free "
            "flat cache cannot represent its -1e10 score — use "
            "video_score_mode='einsum' for corpora with fully-masked rows")
    return _build_flat_feat1(feat1, mask, lp=lp, chunk_v=chunk_v)


def _score_kernel_flat_bmax(qvt_ref, qst_ref, fv_ref, fs_ref, out_ref,
                            bmax_ref, *, chunk_v: int, lp: int,
                            n_videos: int):
    """_score_kernel_flat that ALSO emits the per-grid-step (= per
    chunk_v-video block) score maximum, and masks pad videos (replicated
    rows beyond n_videos) to -inf — feeding ops.span.topk_from_block_max,
    which skips topk_stable_blocked's separate block-max pass over the
    (Nq, Nv) score matrix (the fused video-score -> top-k stage)."""
    dn = (((1,), (0,)), ((), ()))
    nq = qvt_ref.shape[1]
    sv = jax.lax.dot_general(fv_ref[...], qvt_ref[...], dn,
                             preferred_element_type=jnp.float32)
    ss = jax.lax.dot_general(fs_ref[...], qst_ref[...], dn,
                             preferred_element_type=jnp.float32)
    mv = sv.reshape(chunk_v, lp, nq).max(axis=1)
    ms = ss.reshape(chunk_v, lp, nq).max(axis=1)
    s = (mv + ms) / 2
    vidx = (pl.program_id(0) * chunk_v
            + jax.lax.broadcasted_iota(jnp.int32, (chunk_v, nq), 0))
    s = jnp.where(vidx < n_videos, s, -jnp.inf)
    out_ref[...] = s
    _write_bmax_row(bmax_ref, s.max(axis=0), nq)


def _write_bmax_row(bmax_ref, smax, nq):
    """Write one chunk's (nq,) maxima into the revisited (8, nq) bmax
    block. Mosaic requires >= 8 sublanes per output block, so 8 grid
    steps share one block (index map ``i // 8``; consecutive steps keep
    it VMEM-resident) and each step replaces its ``i % 8`` row with a
    lane select — a dynamic single-row store would need 8-aligned
    sublane indices (CLAUDE.md Mosaic gotchas)."""
    r = pl.program_id(0) % 8
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, nq), 0)
    bmax_ref[...] = jnp.where(rows == r, smax[None, :], bmax_ref[...])


def _score_kernel_flat_i8_bmax(qvt_ref, qst_ref, fv_ref, fs_ref, out_ref,
                               bmax_ref, *, chunk_v: int, lp: int,
                               n_videos: int):
    """int8 twin of _score_kernel_flat_bmax (same -inf pad masking and
    per-block maximum emission on the f32-rescaled scores)."""
    dn = (((1,), (0,)), ((), ()))
    nq = qvt_ref.shape[1]
    sv = jax.lax.dot_general(fv_ref[...], qvt_ref[...], dn,
                             preferred_element_type=jnp.int32)
    ss = jax.lax.dot_general(fs_ref[...], qst_ref[...], dn,
                             preferred_element_type=jnp.int32)
    mv = sv.reshape(chunk_v, lp, nq).max(axis=1)
    ms = ss.reshape(chunk_v, lp, nq).max(axis=1)
    s = (mv + ms).astype(jnp.float32) * (0.5 / (127.0 * 127.0))
    vidx = (pl.program_id(0) * chunk_v
            + jax.lax.broadcasted_iota(jnp.int32, (chunk_v, nq), 0))
    s = jnp.where(vidx < n_videos, s, -jnp.inf)
    out_ref[...] = s
    _write_bmax_row(bmax_ref, s.max(axis=0), nq)


@functools.partial(jax.jit, static_argnames=("n_videos", "lp", "chunk_v",
                                             "interpret"))
def video_scores_pallas_flat_bmax(qvt, qst, fv_flat, fs_flat, n_videos: int,
                                  lp: int = 104, chunk_v: int = 16,
                                  interpret: bool = False):
    """video_scores_pallas_flat variant emitting per-chunk block maxima for
    the fused video-score -> top-k stage (ops.span.topk_from_block_max).

    Returns (scores (Nq, Nv_pad) f32 with pad videos at -inf,
    bmax (Nq, Nv_pad / chunk_v) f32). scores[:, :n_videos] is bit-equal to
    video_scores_pallas_flat; bmax[q, b] == max(scores[q, b*chunk_v :
    (b+1)*chunk_v]) exactly (tests/test_pallas_score.py). Works for either
    dtype family: dispatches the int8 kernel when the caches are int8.
    """
    rows, d = fv_flat.shape
    nv_pad = rows // lp
    assert nv_pad * lp == rows
    # chunk_v is an UPPER BOUND (cf. span_sim_pallas_cat_i8): small shards
    # (sharded engine per-device slices) may hold fewer videos than the
    # default chunk; fall back to the largest divisor of nv_pad
    import math
    chunk_v = math.gcd(nv_pad, chunk_v)
    nq = qvt.shape[1]
    grid = (nv_pad // chunk_v,)
    kern = (_score_kernel_flat_i8_bmax if fv_flat.dtype == jnp.int8
            else _score_kernel_flat_bmax)
    out, bmax = pl.pallas_call(
        functools.partial(kern, chunk_v=chunk_v, lp=lp, n_videos=n_videos),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_v * lp, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_v * lp, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk_v, nq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # 8 consecutive grid steps share one (8, nq) bmax block (see
            # _write_bmax_row); rows past nb in the final partial block
            # are never written and sliced off below
            pl.BlockSpec((8, nq), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nv_pad, nq), jnp.float32),
            jax.ShapeDtypeStruct(
                (-(-(nv_pad // chunk_v) // 8) * 8, nq), jnp.float32),
        ],
        interpret=interpret,
    )(qvt, qst, fv_flat, fs_flat)
    return out.T, bmax.T[:, :nv_pad // chunk_v]


def _score_kernel_flat_i8(qvt_ref, qst_ref, fv_ref, fs_ref, out_ref, *,
                          chunk_v: int, lp: int):
    """int8 twin of _score_kernel_flat: s8 x s8 -> s32 MXU dots (2x the
    bf16 FLOP rate on v5e), exact integer per-video max, ONE f32 rescale
    of the (chunk_v, Nq) maxima. The only rounding in the whole stage is
    the input quantization (see quantize_unit_i8)."""
    dn = (((1,), (0,)), ((), ()))
    nq = qvt_ref.shape[1]
    sv = jax.lax.dot_general(fv_ref[...], qvt_ref[...], dn,
                             preferred_element_type=jnp.int32)
    ss = jax.lax.dot_general(fs_ref[...], qst_ref[...], dn,
                             preferred_element_type=jnp.int32)
    mv = sv.reshape(chunk_v, lp, nq).max(axis=1)
    ms = ss.reshape(chunk_v, lp, nq).max(axis=1)
    out_ref[...] = (mv + ms).astype(jnp.float32) * (0.5 / (127.0 * 127.0))


@functools.partial(jax.jit, static_argnames=("n_videos", "lp", "chunk_v",
                                             "interpret"))
def video_scores_pallas_flat_i8(qvt_i8, qst_i8, fv_flat_i8, fs_flat_i8,
                                n_videos: int, lp: int = 104,
                                chunk_v: int = 16, interpret: bool = False):
    """video_scores_pallas_flat on int8-quantized flat caches.

    Engine mode ``video_score_mode="pallas_int8"``: the L2-normalized flat
    feat1 caches and the normalized queries are symmetrically quantized
    with scale 127 (quantize_unit_i8), the dots run s8 x s8 -> s32 on the
    MXU (394 TOPS on v5e vs 197 bf16 TFLOPs — measured 1.7x on the full
    stage, BENCH_NOTES round 3), and the cache HBM halves (the 1M-video
    sharded-capacity lever). Integer accumulation and max are EXACT — the
    kernel is bit-equal to the XLA int8 reference (video_scores_int8_xla,
    tests/test_pallas_score.py); the only approximation is the input
    quantization: per-component error <= 1/254, cosine-score error std
    sqrt(2/3)/254 ~= 0.0032 (measured max ~1.5e-2 on random data; the
    trained-checkpoint metric A/B in BENCH_NOTES is the accuracy
    contract). Reference op: model_xml.py:436-453 at inference.py:308-317
    (an approximate-scoring mode the reference does not have).
    """
    rows, d = fv_flat_i8.shape
    nv_pad = rows // lp
    assert nv_pad * lp == rows
    # chunk_v is an UPPER BOUND (cf. span_sim_pallas_cat_i8): small shards
    # (sharded engine per-device slices) may hold fewer videos than the
    # default chunk; fall back to the largest divisor of nv_pad
    import math
    chunk_v = math.gcd(nv_pad, chunk_v)
    nq = qvt_i8.shape[1]
    out = pl.pallas_call(
        functools.partial(_score_kernel_flat_i8, chunk_v=chunk_v, lp=lp),
        grid=(nv_pad // chunk_v,),
        in_specs=[
            pl.BlockSpec((d, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_v * lp, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_v * lp, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk_v, nq), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nv_pad, nq), jnp.float32),
        interpret=interpret,
    )(qvt_i8, qst_i8, fv_flat_i8, fs_flat_i8)
    return out.T[:, :n_videos]


SPAN_LP = 128  # rows per video in the flat feat2 cache: the span-sweep
#                kernel's (Nq, chunk*LP) -> (Nq, chunk, LP) lane split must
#                be TILE-ALIGNED (LP % 128 == 0) to lower under Mosaic —
#                the Lp=104 variant hits `infer-vector-layout: unsupported
#                shape cast` (BENCH_NOTES round 2 negative result)


def _span_sim_kernel_i8(q8_ref, qs_ref, f8_ref, fs_ref, out_ref, *,
                        chunk_v: int, lp: int):
    """One grid step of the int8 span-similarity sweep: ONE large
    s8 x s8 -> s32 MXU dot over a (chunk_v * lp, 2D) video-major flat
    feat2 block, then the f32 rescale (query scale x per-(video, clip) row
    scale) IN VMEM and a bf16 store. The s32 similarity never reaches HBM
    — the materialized s32 output + {2,0,1} layout copy is exactly what
    killed the XLA einsum version of this mode at corpus scale
    (simsweep_cat_int8, BENCH_NOTES round 3: 14.85 GiB program, OOM)."""
    s = jax.lax.dot_general(q8_ref[...], f8_ref[...],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    sf = s.astype(jnp.float32) * qs_ref[...]           # (qt, chunk*lp)*(qt,1)
    qt = sf.shape[0]
    sf = sf.reshape(qt, chunk_v, lp) * fs_ref[...][None]
    out_ref[...] = sf.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("lp", "chunk_v", "q_tile",
                                             "interpret"))
def span_sim_pallas_cat_i8(q8, q_scale, f8_flat, f_scales,
                           lp: int = SPAN_LP, chunk_v: int = 16,
                           q_tile: int = 128, interpret: bool = False):
    """Corpus-wide int8 concatenated span-similarity sweep (engine mode
    ``span_score_mode="simsweep_cat_int8_flat"``, wired through
    engine._score_query_batch -> XML.merged_st_ed_scores_pallas_cat_i8).

    Computes sim[q, v, l] = (q8[q] . f8[v*lp+l]) * q_scale[q] * f_scales[v, l]
    and stores it bf16 in a GATHER-FRIENDLY (Nq, Nv_pad, lp) layout: the
    engine's top-V row gather then reads contiguous lp-rows on the
    second-minor axis (the flat (Nq, Nv*lp) layout would need minor-dim
    slice gathers, which degrade to element gathers — BENCH_NOTES round 2).

    Why this beats the bf16 XLA cat sweep it approximates: the s8 dot runs
    at 2x the bf16 MXU rate (394 TOPS on v5e), which pays for both the
    L -> 128 pad FLOPs and the bf16 similarity write that XLA's fused bf16
    sweep avoids. Reference op being approximated: model_xml.py:463-480
    restricted to inference.py:348's top videos.

    Args:
        q8: (Nq, K) int8 quantized HALVED concatenated query vectors
            (see XML.merged_st_ed_scores_simgather_cat_i8's layout).
        q_scale: (Nq, 1) f32 per-query dequantization scales.
        f8_flat: (Nv_pad * lp, K) int8 video-major flat feat2 cache from
            :func:`build_flat_feat2_i8` (L -> lp pad rows are zeros).
        f_scales: (Nv_pad, lp) f32 per-(video, clip) row scales.
    Returns:
        (Nq, Nv_pad, lp) bf16 similarity. Bit-equal to
        :func:`span_sim_int8_xla` (tests/test_pallas_score.py).
    """
    if lp % 128 != 0:
        raise ValueError(f"lp={lp} must be a multiple of 128: the kernel's "
                         "(qt, chunk*lp) -> (qt, chunk, lp) lane split must "
                         "be tile-aligned to lower under Mosaic (SPAN_LP)")
    rows, k = f8_flat.shape
    nv_pad = rows // lp
    assert nv_pad * lp == rows
    # chunk_v is an UPPER BOUND: small shards (e.g. the sharded engine's
    # per-device slices) may hold fewer or non-multiple video counts — fall
    # back to the largest divisor of nv_pad that fits (the cache builder
    # guarantees nv_pad % its own chunk_v == 0, so production shapes keep
    # the requested chunk)
    import math
    chunk_v = math.gcd(nv_pad, chunk_v)
    nq = q8.shape[0]
    # pad queries to a q_tile multiple; round q_tile itself up to the int8
    # sublane tile (32) so the q8 block is always Mosaic-lowerable. The
    # feat2 block is fetched once per video chunk regardless of q_tile
    # (queries are the minor grid axis), so q_tile only trades VMEM
    # footprint against q8 re-fetch traffic. Zero pad rows dot to zero.
    q_tile = -(-q_tile // 32) * 32
    qt = min(q_tile, -(-nq // 32) * 32)
    pad_q = (-nq) % qt
    if pad_q:
        q8 = jnp.pad(q8, ((0, pad_q), (0, 0)))
        q_scale = jnp.pad(q_scale, ((0, pad_q), (0, 0)))
    nq_pad = nq + pad_q
    grid = (nv_pad // chunk_v, nq_pad // qt)   # queries minor: the feat2
    #   block is read ONCE per video chunk; the small q tiles re-fetch
    out = pl.pallas_call(
        functools.partial(_span_sim_kernel_i8, chunk_v=chunk_v, lp=lp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, k), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_v * lp, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_v, lp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qt, chunk_v, lp), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_pad, nv_pad, lp), jnp.bfloat16),
        interpret=interpret,
    )(q8, q_scale, f8_flat, f_scales)
    return out[:nq]


def span_sim_int8_xla(q8, q_scale, f8_flat, f_scales, lp: int = SPAN_LP):
    """Integer-exact XLA reference for span_sim_pallas_cat_i8 (tests; small
    shapes only — it materializes the (Nq, Nv_pad*lp) s32 similarity, the
    very buffer the kernel exists to avoid)."""
    s = jax.lax.dot_general(
        q8.astype(jnp.int32), f8_flat.astype(jnp.int32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    sf = s.astype(jnp.float32) * q_scale                 # (Nq, rows)
    nq = q8.shape[0]
    sf = sf.reshape(nq, -1, lp) * f_scales[None]
    return sf.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("lp", "chunk_v"))
def _build_flat_feat2_i8(feat2_cat, lp: int, chunk_v: int):
    nv, L, k = feat2_cat.shape
    q, scales = quantize_rows_i8(feat2_cat)              # (Nv, L, K), (Nv, L)
    # L -> lp pad rows are ZEROS (sim 0; they sit beyond L and are sliced
    # off after the engine's row gather, before conv/mask)
    q = jnp.pad(q, ((0, 0), (0, lp - L), (0, 0)))
    scales = jnp.pad(scales, ((0, 0), (0, lp - L)))
    pad_v = (-nv) % chunk_v
    if pad_v:  # pad videos are zeros too; gather_idx never reaches them
        q = jnp.pad(q, ((0, pad_v), (0, 0), (0, 0)))
        scales = jnp.pad(scales, ((0, pad_v), (0, 0)))
    return q.reshape((nv + pad_v) * lp, k), scales


def build_flat_feat2_i8(feat2_cat, lp: int = SPAN_LP, chunk_v: int = 16):
    """(Nv, L, 2D) concatenated feat2 -> int8 video-major flat cache for
    :func:`span_sim_pallas_cat_i8`: per-(video, clip)-row symmetric
    quantization (quantize_rows_i8 — feat2 is not unit-norm, so scales are
    kept), zero-padded L -> lp rows and Nv -> chunk_v-multiple videos.

    Returns (f8_flat (Nv_pad*lp, 2D) int8, f_scales (Nv_pad, lp) f32).
    Masked clips keep their encoder outputs, exactly like every other
    sweep mode: the reference computes conv over padded positions and
    re-masks afterwards (model_xml.py:486-497), so masked-position
    similarities must be real values, not zeros.
    """
    nv, L, k = feat2_cat.shape
    if lp % 128 != 0:
        raise ValueError(f"lp={lp} must be a multiple of 128 (see "
                         "span_sim_pallas_cat_i8 / SPAN_LP)")
    if L > lp:
        raise ValueError(
            f"max_ctx_l={L} exceeds the span-sweep kernel row pad lp={lp}; "
            "use span_score_mode='simsweep_cat' for longer contexts")
    return _build_flat_feat2_i8(feat2_cat, lp=lp, chunk_v=chunk_v)


@jax.jit
def quantize_unit_i8(x):
    """Symmetric int8 quantization for unit-norm rows: round(127 * x),
    clipped. Components of an L2-normalized row lie in [-1, 1], so the
    per-component error is <= 1/254 (round-to-nearest-even)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * 127.0),
                    -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("axis",))
def quantize_rows_i8(x, axis: int = -1):
    """Symmetric per-row int8 quantization for NON-unit rows (the feat2
    localization cache, which is not L2-normalized — unlike feat1, see
    quantize_unit_i8): scale s = max|row| / 127 per row along ``axis``;
    q = round(x / s) clipped to [-127, 127].

    Returns (q_int8, scales) with ``scales`` shaped like ``x`` minus the
    quantized axis. Per-component error <= s/2 = max|row| / 254; a dot
    against a quantized row rescales by the row's scale afterwards.
    """
    x = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(x), axis=axis, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)  # all-zero rows quantize to zeros
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(s, axis=axis)


def video_scores_int8_xla(qv_i8, qs_i8, fv_flat_i8, fs_flat_i8,
                          n_videos: int, lp: int):
    """Integer-exact XLA reference for the int8 kernel (tests; small shapes
    only — the (Nq, Nv*lp) s32 intermediate is materialized here, which the
    kernel never does)."""
    def one(q, f):
        s = jax.lax.dot_general(
            q.astype(jnp.int32), f.astype(jnp.int32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
        return s.reshape(s.shape[0], -1, lp).max(axis=2)
    out = ((one(qv_i8, fv_flat_i8) + one(qs_i8, fs_flat_i8))
           .astype(jnp.float32) * (0.5 / (127.0 * 127.0)))
    return out[:, :n_videos]


def video_scores_xla(qv, qs, feat1_v, feat1_s, mask):
    """The engine's einsum path (scores_prenormalized without the query
    normalization, which the caller has already applied) — the exactness
    reference for the kernel."""
    def one(q, f):
        s = jnp.einsum("md,nld->mln", q, f,
                       preferred_element_type=jnp.float32)
        s = s * mask.T[None] + (1.0 - mask.T[None]) * NEG_INF
        return s.max(axis=1)
    return (one(qv, feat1_v) + one(qs, feat1_s)) / 2

"""Pallas TPU kernels for the retrieval hot path.

``fused_video_scores``: the query->video scoring stage of corpus retrieval
(reference get_video_level_scores, model_xml.py:436-453 + exp fusion,
inference.py:317). XLA's einsum("md,nld->mln") materializes the (M, L, Nv)
clip-similarity tensor to HBM (~436MB per stream at corpus scale) before the
masked max reduces it. This kernel tiles the corpus over the grid and folds
the max-over-clips into a running accumulator: each grid step loops over
clips, issuing one (M, D) x (D, BV) MXU matmul per clip — the similarity
block never leaves VMEM.

Layout notes (Mosaic tiling constraints): the clip features are passed
CLIP-MAJOR, (L, Nv, D), so the per-clip dynamic index hits the untiled
leading axis; the mask is (L, 1, Nv) for the same reason. Inputs are
expected pre-normalized (queries and clip features), matching the engine's
cache layout, so the dot products ARE cosine similarities.

Measured on v5e (M=50, Nv=21888, L=100, D=256, bf16): this kernel runs at
20.7 ms/call vs 15.4 ms for XLA's einsum+mask+max — the per-clip
(50x256)x(256x128) matmuls under-utilize the MXU, while XLA fuses the max
into one large contraction. The production engine therefore stays on the
XLA path; the kernel is kept as validated Pallas infrastructure (and the
baseline for a future fused score+top-k kernel with DMA double-buffering).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10


def _video_scores_kernel(q_ref, feat_ref, mask_ref, out_ref, *, alpha, n_clips):
    """Grid step over one corpus tile.

    q_ref: (M, D) normalized queries (VMEM, whole)
    feat_ref: (L, BV, D) clip-major normalized features tile
    mask_ref: (L, 1, BV) validity tile
    out_ref: (M, BV) output tile = exp(alpha * max_l cos(q, clip))
    """
    q = q_ref[:]                                    # (M, D)
    M = q.shape[0]
    BV = out_ref.shape[1]

    def body(l, acc):
        feat_l = feat_ref[l]                        # (BV, D)
        sims = jax.lax.dot_general(
            q, feat_l,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (M, BV)
        m = mask_ref[l]                             # (1, BV)
        sims = sims * m + (1.0 - m) * NEG_INF
        return jnp.maximum(acc, sims)

    scores = jax.lax.fori_loop(
        0, n_clips, body, jnp.full((M, BV), NEG_INF, jnp.float32))
    if alpha is not None:
        scores = jnp.exp(alpha * scores)
    out_ref[:] = scores.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("alpha", "block_videos", "interpret"))
def fused_video_scores_clip_major(queries: jnp.ndarray, feat1_t: jnp.ndarray,
                                  mask_t: jnp.ndarray,
                                  alpha: float | None = None,
                                  block_videos: int = 128,
                                  interpret: bool = False):
    """(M, D) x (L, Nv, D) clip-major -> (M, Nv) fused masked-max scores.

    mask_t: (L, 1, Nv). Nv must be divisible by block_videos (pad with
    mask=0 columns); on real TPU block_videos must be a multiple of 128.
    """
    M, D = queries.shape
    L, Nv, _ = feat1_t.shape
    assert Nv % block_videos == 0, f"Nv={Nv} % block_videos={block_videos}"
    grid = (Nv // block_videos,)

    return pl.pallas_call(
        functools.partial(_video_scores_kernel, alpha=alpha, n_clips=L),
        out_shape=jax.ShapeDtypeStruct((M, Nv), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block_videos, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, block_videos), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, block_videos), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(queries, feat1_t, mask_t)


def fused_video_scores(queries: jnp.ndarray, feat1: jnp.ndarray,
                       mask: jnp.ndarray, alpha: float | None = None,
                       block_videos: int = 128, interpret: bool = False):
    """Video-major convenience wrapper: (Nv, L, D) + (Nv, L) inputs."""
    feat1_t = jnp.transpose(feat1, (1, 0, 2))
    mask_t = jnp.transpose(mask, (1, 0))[:, None, :]
    return fused_video_scores_clip_major(queries, feat1_t, mask_t, alpha,
                                         block_videos, interpret)


def fused_video_scores_xla(queries: jnp.ndarray, feat1: jnp.ndarray,
                           mask: jnp.ndarray, alpha: float | None = None):
    """Reference XLA implementation (used on CPU and in tests)."""
    sims = jnp.einsum("md,nld->mnl", queries, feat1,
                      preferred_element_type=jnp.float32)
    m = mask[None]
    sims = sims * m + (1.0 - m) * NEG_INF
    scores = jnp.max(sims, axis=2)
    return jnp.exp(alpha * scores) if alpha is not None else scores

"""Pallas TPU kernels for the retrieval hot path.

``fused_video_scores``: the query->video scoring stage of corpus retrieval
(reference get_video_level_scores, model_xml.py:436-453 + exp fusion,
inference.py:317). XLA's einsum("md,nld->mln") materializes the (M, L, Nv)
clip-similarity tensor to HBM (~436MB per stream at corpus scale) before the
masked max reduces it. This kernel tiles the corpus over the grid, keeps the
(M, BV, L) block in VMEM, and fuses matmul (MXU) + pad-mask + max-over-clips
+ exp(alpha*.) in one pass, writing only the (M, Nv) result.

Inputs are expected pre-normalized (queries and clip features), matching the
engine's cache layout, so the dot products ARE cosine similarities.
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
    feat_ref: (BV, L, D) normalized clip features tile
    mask_ref: (BV, L) validity tile
    out_ref: (M, BV) output tile = exp(alpha * max_l cos(q, clip))

    Mosaic only lowers 2-D dots, so the max-over-clips runs as a fori loop
    over L: each step is one (M, D) x (D, BV) MXU matmul folded into a
    running masked max — the (M, BV, L) similarity block never exists.
    """
    q = q_ref[:]                                    # (M, D)
    M = q.shape[0]
    BV = mask_ref.shape[0]

    def body(l, acc):
        feat_l = feat_ref[:, l, :]                  # (BV, D)
        sims = jax.lax.dot_general(
            q, feat_l,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (M, BV)
        m = mask_ref[:, l][None]                    # (1, BV)
        sims = sims * m + (1.0 - m) * NEG_INF
        return jnp.maximum(acc, sims)

    scores = jax.lax.fori_loop(
        0, n_clips, body, jnp.full((M, BV), NEG_INF, jnp.float32))
    if alpha is not None:
        scores = jnp.exp(alpha * scores)
    out_ref[:] = scores.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("alpha", "block_videos", "interpret"))
def fused_video_scores(queries: jnp.ndarray, feat1: jnp.ndarray,
                       mask: jnp.ndarray, alpha: float | None = None,
                       block_videos: int = 128, interpret: bool = False):
    """(M, D) x (Nv, L, D) -> (M, Nv) fused masked-max cosine scores.

    queries and feat1 must be L2-normalized. Padded videos (mask all-zero)
    score exp(alpha * -1e10) = 0 (or -1e10 without alpha), like the XLA path.
    Nv must be divisible by block_videos (pad with mask=0 rows); on real TPU
    block_videos must be a multiple of 128 (output-lane tiling constraint).
    """
    M, D = queries.shape
    Nv, L, _ = feat1.shape
    assert Nv % block_videos == 0, f"Nv={Nv} % block_videos={block_videos}"
    grid = (Nv // block_videos,)

    return pl.pallas_call(
        functools.partial(_video_scores_kernel, alpha=alpha, n_clips=L),
        out_shape=jax.ShapeDtypeStruct((M, Nv), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_videos, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_videos, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, block_videos), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(queries, feat1, mask)


def fused_video_scores_xla(queries: jnp.ndarray, feat1: jnp.ndarray,
                           mask: jnp.ndarray, alpha: float | None = None):
    """Reference XLA implementation (used on CPU and in tests)."""
    sims = jnp.einsum("md,nld->mnl", queries, feat1,
                      preferred_element_type=jnp.float32)
    m = mask[None]
    sims = sims * m + (1.0 - m) * NEG_INF
    scores = jnp.max(sims, axis=2)
    return jnp.exp(alpha * scores) if alpha is not None else scores

"""Fused banded-joint + top-K Pallas TPU kernel for VCMR span selection.

Replaces the engine's hottest stage (reference flat sort, inference.py:378-386;
XLA path: ops/span.banded_topk_spans): build the banded (st, ed) joint
``st_prob * ed_prob * video_score`` and reduce it to the global top-K spans
per query WITHOUT materializing the (Nq, V, L, W) joint to HBM or running
XLA's O(n log n) sort over 140K elements per query.

Per grid step (one query):
  * for each candidate video (already ordered by descending video score):
    build its (W, L) band tile in VMEM (W lane-rolls of the ed row), check
    its max against the running top-K buffer's worst element, and SKIP the
    video entirely when it cannot contribute (the common case — video
    scores decay as exp(alpha * cos));
  * otherwise bitonic-sort the 2048-element tile (descending) and
    bitonic-merge its top 256 with the running buffer (a [desc ; asc]
    "valley" is bitonic, so the merge needs no reversals).

Exactness: tie order matches the XLA path bit-for-bit — every element
carries its canonical flat index (v*L*W + st*W + w, the same flat order
``banded_topk_spans`` sorts), comparisons are compound (value desc, index
asc — the tie order of XLA's stable top_k), and the joint products are the
same f32 multiplies in the same order. Verified by tests/test_pallas_topk.py
in interpret mode AND bit-exact on real v5e hardware.

Measured at corpus scale (Nq=100, V=100, L=100, W=14, top_n=200, v5e):
21.7 ms vs XLA flat 14.1 ms — breakdown: skip path 2.8 ms, per-tile bitonic
sort+merge ~6.2 us at a ~29% displacement rate on near-uniform (untrained)
probabilities. The production engine instead uses
``ops.span.banded_topk_spans_grouped`` (3.8 ms, also bit-exact): its
monotone group-max bound prunes in O(V*L) BEFORE any sort, which beats
streaming per-video sorts when probabilities are flat. This kernel remains
validated infrastructure for distributions where per-video skipping wins
(strongly peaked probs -> displacement collapses toward K/n).

Layout notes (Mosaic): the dynamically-indexed video axis is the untiled
LEADING dim of the (V, Nq, 128) inputs (see CLAUDE.md); band construction
uses lane-axis rolls; the bitonic networks use lane rolls for strides < 128
and sublane rolls for strides >= 128 (XOR partners never select a wrapped
element).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
INT_MAX = 2**31 - 1

_LANES = 128          # tile lane width (>= L)
_TILE_SUB = 16        # tile sublanes (>= W)
_BUF_SUB = 2          # buffer sublanes: K = _BUF_SUB * _LANES = 256


def _compound_gt_i(v, i, pv, pi):
    """int32 {0,1}: (v, i) beats (pv, pi) in (value desc, index asc) order.

    Boolean algebra is done in int32 — Mosaic cannot lower vector i1<->i8
    conversions that and/or on packed bool vectors produce.
    """
    gt = jnp.where(v > pv, 1, 0)
    eq = jnp.where(v == pv, 1, 0)
    lt = jnp.where(i < pi, 1, 0)
    return gt + eq * lt                     # disjoint terms, still {0,1}


def _bitonic_stage(v, i, j, k, invert):
    """One compare-exchange pass at stride j, block size k, over (S, 128)
    arrays of (value, index) pairs laid out row-major (p = sublane*128+lane).

    invert=False sorts ascending in (value asc, index desc) order —
    i.e. position n-1 holds the best element by (value desc, index asc);
    invert=True sorts descending (position 0 best).
    """
    S, Ln = v.shape
    p = (jax.lax.broadcasted_iota(jnp.int32, (S, Ln), 0) * Ln
         + jax.lax.broadcasted_iota(jnp.int32, (S, Ln), 1))
    if j < Ln:  # roll only takes non-negative shifts: forward = Ln - j
        pv_f, pv_b = pltpu.roll(v, Ln - j, axis=1), pltpu.roll(v, j, axis=1)
        pi_f, pi_b = pltpu.roll(i, Ln - j, axis=1), pltpu.roll(i, j, axis=1)
    else:
        s = j // Ln
        pv_f, pv_b = pltpu.roll(v, S - s, axis=0), pltpu.roll(v, s, axis=0)
        pi_f, pi_b = pltpu.roll(i, S - s, axis=0), pltpu.roll(i, s, axis=0)
    bj = (p >> (j.bit_length() - 1)) & 1    # 1 => high element of the pair
    bk = (p >> (k.bit_length() - 1)) & 1    # 1 => descending block
    pv = jnp.where(bj == 0, pv_f, pv_b)
    pi = jnp.where(bj == 0, pi_f, pi_b)
    # eff: "mine should sit later in this block's ascending order"
    eff = (_compound_gt_i(pv, pi, v, i) if invert
           else _compound_gt_i(v, i, pv, pi))
    take = jnp.where(bj == bk, eff, 1 - eff)
    return (jnp.where(take == 1, pv, v), jnp.where(take == 1, pi, i))


def _bitonic_sort(v, i, invert):
    """Full bitonic sort of an (S, 128) tile (S * 128 must be a power of 2)."""
    n = v.shape[0] * v.shape[1]
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            v, i = _bitonic_stage(v, i, j, k, invert)
            j //= 2
        k *= 2
    return v, i


def _bitonic_merge(v, i):
    """Ascending merge of an (S, 128) BITONIC sequence (e.g. [desc ; asc])."""
    n = v.shape[0] * v.shape[1]
    j = n // 2
    while j >= 1:
        v, i = _bitonic_stage(v, i, j, k=n, invert=False)
        j //= 2
    return v, i


_QG = 8  # queries per grid step (Mosaic block sublane granularity)


def _make_kernel(V: int, L: int, W: int, min_l: int):
    def kernel(st_ref, ed_ref, vs_ref, out_v_ref, out_i_ref, tv, ti, bv, bi):
        lane = jax.lax.broadcasted_iota(jnp.int32, (_TILE_SUB, _LANES), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (_TILE_SUB, _LANES), 0)

        for qi in range(_QG):                          # static: 8 queries/block
            # running top-K buffer, ASCENDING (position 0 = worst); initial
            # entries are -inf with unique large indices, losing every tie
            bv[:] = jnp.full((_BUF_SUB, _LANES), NEG_INF, jnp.float32)
            bi[:] = (jax.lax.broadcasted_iota(
                        jnp.int32, (_BUF_SUB, _LANES), 0) * _LANES
                     + jax.lax.broadcasted_iota(
                        jnp.int32, (_BUF_SUB, _LANES), 1)
                     + jnp.int32(1 << 30))

            def per_video(vid, carry):
                # row qi of the (QG, 128) slab via sublane roll + aligned slice
                take_row = lambda ref: pltpu.roll(
                    ref[vid], (_QG - qi) % _QG, axis=0)[0:1, :]
                st_row = take_row(st_ref)              # (1, 128)
                ed_row = take_row(ed_ref)
                vs = vs_ref[vid, qi, 0]

                # band rows: tile[w, st] = st[st] * ed[st+min_l+w] * vscore
                for w in range(W):
                    shifted = pltpu.roll(
                        ed_row, (_LANES - (min_l + w)) % _LANES, axis=1)
                    tv[w:w + 1, :] = st_row * shifted * vs
                # three-way mask, mirroring XLA's flat banded array exactly:
                #   * in-band valid span: the product (already written)
                #   * in-band, end beyond the clip axis: 0.0 with its REAL
                #     canonical index (XLA keeps these zeros and its stable
                #     top_k can return them)
                #   * tile padding (w >= W or st >= L): -inf, never returned
                # (int32 mask algebra: Mosaic can't lower vector i1 and/or)
                in_flat = (jnp.where(sub < W, 1, 0)
                           * jnp.where(lane < L, 1, 0))
                valid = in_flat * jnp.where(lane < (L - min_l) - sub, 1, 0)
                tv[:] = jnp.where(valid == 1, tv[:],
                                  jnp.where(in_flat == 1, 0.0, NEG_INF))
                # canonical flat index: v*L*W + st*W + w (st=lane, w=sublane)
                ti[:] = jnp.where(in_flat == 1,
                                  vid * (L * W) + lane * W + sub, INT_MAX)

                # skip the video unless it can displace the buffer's worst
                m = jnp.max(tv[:])
                ti_at_m = jnp.min(jnp.where(tv[:] == m, ti[:], INT_MAX))
                wv, wi = bv[0, 0], bi[0, 0]
                displace = (m > wv) | ((m == wv) & (ti_at_m < wi))

                @pl.when(displace)
                def _():
                    sv, si = _bitonic_sort(tv[:], ti[:], invert=True)  # desc
                    # [tile-top-256 desc ; buffer asc] is bitonic ("valley")
                    cv = jnp.concatenate([sv[:_BUF_SUB], bv[:]], axis=0)
                    ci = jnp.concatenate([si[:_BUF_SUB], bi[:]], axis=0)
                    cv, ci = _bitonic_merge(cv, ci)                    # asc
                    bv[:] = cv[_BUF_SUB:]
                    bi[:] = ci[_BUF_SUB:]

                return carry

            jax.lax.fori_loop(0, V, per_video, None)
            out_v_ref[qi] = bv[:]
            out_i_ref[qi] = bi[:]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("min_l", "max_l", "top_n", "interpret"))
def banded_topk_spans_pallas(st_probs: jnp.ndarray, ed_probs: jnp.ndarray,
                             video_scores: jnp.ndarray, min_l: int,
                             max_l: int, top_n: int, interpret: bool = False):
    """Drop-in exact replacement for ops.span.banded_topk_spans.

    Args:
        st_probs / ed_probs: (Nq, V, L) f32; video_scores: (Nq, V) f32,
            rows assumed ordered by descending video score (the engine's
            top-V output order) — required only for SPEED (skip rate), not
            correctness.
    Returns:
        (video_local_idx, st_idx, ed_idx, scores), each (Nq, top_n).
    """
    nq, V, L = st_probs.shape
    W = max_l - min_l
    K = _BUF_SUB * _LANES
    if W > _TILE_SUB or L > _LANES or top_n > K:
        raise ValueError(f"kernel limits: W<={_TILE_SUB}, L<={_LANES}, "
                         f"top_n<={K}; got W={W} L={L} top_n={top_n}")

    nqp = ((nq + _QG - 1) // _QG) * _QG                 # pad queries to 8
    pad_q, pad_l = nqp - nq, _LANES - L
    tr = lambda x: jnp.pad(x.astype(jnp.float32).transpose(1, 0, 2),
                           ((0, 0), (0, pad_q), (0, pad_l)))
    stT = tr(st_probs)                                  # (V, nqp, 128)
    edT = tr(ed_probs)
    # video scores broadcast along lanes so the block tiling matches st/ed
    # (the kernel reads one scalar per (video, query))
    vsB = jnp.broadcast_to(
        jnp.pad(video_scores.astype(jnp.float32).T, ((0, 0), (0, pad_q)))
        [:, :, None], (V, nqp, _LANES))

    slab = lambda g: (0, g, 0)
    out_v, out_i = pl.pallas_call(
        _make_kernel(V, L, W, min_l),
        grid=(nqp // _QG,),
        in_specs=[
            pl.BlockSpec((V, _QG, _LANES), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((V, _QG, _LANES), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((V, _QG, _LANES), slab, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_QG, _BUF_SUB, _LANES), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_QG, _BUF_SUB, _LANES), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nqp, _BUF_SUB, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((nqp, _BUF_SUB, _LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_TILE_SUB, _LANES), jnp.float32),
            pltpu.VMEM((_TILE_SUB, _LANES), jnp.int32),
            pltpu.VMEM((_BUF_SUB, _LANES), jnp.float32),
            pltpu.VMEM((_BUF_SUB, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(stT, edT, vsB)

    vals = out_v.reshape(nqp, K)[:nq]
    idx = out_i.reshape(nqp, K)[:nq]
    # final exact ordering: (value desc, canonical index asc) — identical to
    # XLA's stable top_k over the flat banded joint
    neg, flat = jax.lax.sort((-vals, idx), num_keys=2)
    scores = -neg[:, :top_n]
    flat = flat[:, :top_n]
    # initial-buffer sentinels (only present when the band has < top_n
    # elements) decode to zeros like the XLA path's padding
    real = scores > NEG_INF
    scores = jnp.where(real, scores, 0.0)
    flat = jnp.where(real, flat, 0)
    vid = flat // (L * W)
    rem = flat % (L * W)
    m = rem // W
    n = m + min_l + rem % W
    return (vid.astype(jnp.int32), m.astype(jnp.int32),
            n.astype(jnp.int32), scores)

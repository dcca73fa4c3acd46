"""Span scoring ops: min/max-length masks and on-device top-k span extraction.

The reference does the joint start-end scoring with host numpy sorts
(inference.py:378-386, tensor_utils.py:115-141). Here everything runs on
device: the (st, ed) outer product is masked with a static upper-triangular
band and reduced with ``jax.lax.top_k``; the host only receives the final
top-N indices/scores.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def min_max_length_mask(length: int, min_l: int, max_l: int) -> np.ndarray:
    """(L, L) float mask; (st, ed) valid iff min_l <= ed - st < max_l.

    Matches reference generate_min_max_length_mask (inference.py:170-192):
    triu(k=min_l) * (1 - triu(k=max_l)). Static — precompute on host.
    """
    ones = np.ones((length, length), dtype=np.float32)
    return np.triu(ones, k=min_l) * (1.0 - np.triu(ones, k=max_l))


@partial(jax.jit, static_argnames=("top_n",))
def top_spans_from_probs(st_probs: jnp.ndarray, ed_probs: jnp.ndarray,
                         length_mask: jnp.ndarray, top_n: int):
    """Top-N (st, ed) pairs by st_prob * ed_prob under a length mask.

    Args:
        st_probs / ed_probs: (N, L)
        length_mask: (L, L) static validity mask (see min_max_length_mask)
        top_n: number of spans returned per row

    Returns:
        st_idx, ed_idx: (N, top_n) int32; scores: (N, top_n) float32,
        sorted descending. On-device replacement for the reference's
        find_max_triples_from_upper_triangle_product (tensor_utils.py:115).
    """
    n, L = st_probs.shape
    joint = st_probs[:, :, None] * ed_probs[:, None, :] * length_mask[None]
    flat = joint.reshape(n, L * L)
    scores, idx = jax.lax.top_k(flat, top_n)
    return (idx // L).astype(jnp.int32), (idx % L).astype(jnp.int32), scores


@partial(jax.jit, static_argnames=("block",))
def chunked_masked_max_scores(queries_n: jnp.ndarray, feat1_n: jnp.ndarray,
                              mask: jnp.ndarray, block: int = 2048) -> jnp.ndarray:
    """(M, D) x (Nv, L, D) -> (M, Nv) masked max-over-clips dot scores,
    computed block-by-block with lax.scan so the (M, L, Nv) similarity
    tensor (8.7GB at corpus scale) is never materialized — only one
    (M, block, L) tile lives at a time. Exact-equivalent to
    ``einsum('md,nld->mln') -> mask -> max`` (measured ~2x faster at
    21.8K x 100 x 256 on v5e).

    Inputs are expected pre-normalized when cosine scores are wanted.
    """
    M, D = queries_n.shape
    Nv, L, _ = feat1_n.shape
    pad = (-Nv) % block
    if pad:
        feat1_n = jnp.pad(feat1_n, ((0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
    nb = (Nv + pad) // block
    feat_blocks = feat1_n.reshape(nb, block, L, D)
    mask_blocks = mask.reshape(nb, block, L)

    def body(carry, inp):
        fb, mb = inp                                       # (B, L, D), (B, L)
        s = jax.lax.dot_general(
            queries_n.astype(fb.dtype), fb.reshape(block * L, D),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (M, B*L)
        s = s.reshape(M, block, L)
        s = s * mb[None] + (1.0 - mb[None]) * -1e10
        return carry, s.max(axis=2)                        # (M, B)

    _, blocks = jax.lax.scan(body, None, (feat_blocks, mask_blocks))
    scores = jnp.moveaxis(blocks, 0, 1).reshape(M, nb * block)
    return scores[:, :Nv]


@partial(jax.jit, static_argnames=("k", "block"))
def topk_stable_blocked(scores: jnp.ndarray, k: int, block: int = 16):
    """EXACT stable top-k over the last axis via block-max pruning.

    Bit-equal to ``jax.lax.top_k`` (including its stable ascending-index tie
    order) but faster on TPU for wide rows: every element of the true
    top-k lives in a block whose max is >= the k-th value, and at most k
    such blocks are needed when block ties break by ascending block index —
    exactly lax.top_k's stable rule over block maxima (same cover argument
    as banded_topk_spans_grouped). Selected blocks are re-sorted ascending
    so the expanded candidate pool is in original index order, making the
    final stable top_k's position tie-break the original-index tie-break.

    Block-size sweeps on v5e (bit-exact at every block size): the video
    row ((800, 21818) k=100) runs fastest at the default block=16 (4.63 ms
    vs lax 7.45); the span group row ((800, 10400) k=200) at block=8
    (5.37 ms vs 6.14 at 16, lax 8.53) — callers pass block per shape
    (scripts/measure_span_topk_variants.py, BENCH_NOTES rounds 2-3).
    """
    nq, n = scores.shape
    if n <= k or n <= 2 * block:
        return jax.lax.top_k(scores, min(k, n))
    pad = (-n) % block
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    padded = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=neg_inf)
    nb = padded.shape[1] // block
    bmax = padded.reshape(nq, nb, block).max(axis=-1)
    kb = min(k, nb)
    _, bidx = jax.lax.top_k(bmax, kb)
    bidx = jax.lax.sort(bidx, dimension=1)
    pool = jnp.take_along_axis(padded.reshape(nq, nb, block),
                               bidx[:, :, None], axis=1)     # (Nq, kb, block)
    vals, pos = jax.lax.top_k(pool.reshape(nq, kb * block), k)
    src = jnp.take_along_axis(bidx, pos // block, axis=1) * block + pos % block
    # for finite inputs pad (-inf) elements are never selected (n >= k and
    # every real value > -inf), so this clip is a no-op and bit-equality
    # with lax.top_k holds; with NaN inputs the cover argument breaks (NaN
    # block maxima are unordered) and selection is garbage either way —
    # the clip keeps indices in-range like lax.top_k's, so callers indexing
    # metadata don't crash on a NaN-poisoned model (seen: CAL distances)
    return vals, jnp.minimum(src, n - 1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "block", "interpret"))
def topk_stable_blocked_psort(scores: jnp.ndarray, k: int, block: int = 8,
                              interpret: bool = False):
    """topk_stable_blocked with both ``lax.top_k`` calls replaced by the
    lane-parallel transposed bitonic kernel (ops.pallas_sort.
    topk_transposed) — bit-equal to ``jax.lax.top_k`` (the kernel
    reproduces the stable tie order, and the blocked cover argument is
    selection-impl-independent; tests/test_pallas_sort.py +
    tests/test_span_score_modes.py). XLA's TopK sorts along the LANE axis
    (cross-lane exchanges); the kernel sorts 128 queries in lockstep down
    the SUBLANE axis. Engine-level measurement was NEGATIVE (-6.7% at
    corpus scale — transpose/pad copies outweigh the sort win inside the
    fused program; BENCH_NOTES round 5); kept as validated bit-exact
    infrastructure for long-row / small-k / pre-transposed shapes."""
    from tvretrieval_tpu.ops.pallas_sort import topk_transposed
    nq, n = scores.shape
    if n <= k or n <= 2 * block:
        return jax.lax.top_k(scores, min(k, n))
    pad = (-n) % block
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    padded = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=neg_inf)
    nb = padded.shape[1] // block
    bmax = padded.reshape(nq, nb, block).max(axis=-1)
    kb = min(k, nb)
    _, bidx = topk_transposed(bmax, kb, interpret=interpret)
    bidx = jax.lax.sort(bidx, dimension=1)
    pool = jnp.take_along_axis(padded.reshape(nq, nb, block),
                               bidx[:, :, None], axis=1)     # (Nq, kb, block)
    vals, pos = topk_transposed(pool.reshape(nq, kb * block), k,
                                interpret=interpret)
    src = jnp.take_along_axis(bidx, pos // block, axis=1) * block + pos % block
    return vals, jnp.minimum(src, n - 1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "block"))
def topk_from_block_max(scores_padded: jnp.ndarray, bmax: jnp.ndarray,
                        k: int, block: int = 16):
    """topk_stable_blocked when the block maxima are ALREADY computed —
    e.g. emitted by the fused video-score kernel
    (ops.pallas_score.video_scores_pallas_flat_bmax) — skipping the
    separate block-max pass over the full (Nq, N_pad) score matrix.

    Args:
        scores_padded: (Nq, N_pad) with N_pad % block == 0; positions
            beyond the true element count must be -inf (the kernel masks
            pad videos to -inf).
        bmax: (Nq, N_pad / block) exact per-block maxima of scores_padded.
        k: top-k count; must be <= the true (non--inf) element count for
            bit-equality with ``lax.top_k`` over the unpadded row.

    Returns (values, indices), bit-equal to
    ``topk_stable_blocked(scores_padded[:, :n], k, block)`` (same cover
    argument: -inf pad blocks rank strictly below any real block, and the
    candidate pool gathered from selected blocks contains every true
    top-k element; tests/test_pallas_topk.py).
    """
    nq, n_pad = scores_padded.shape
    nb = n_pad // block
    assert bmax.shape == (nq, nb)
    kb = min(k, nb)
    _, bidx = jax.lax.top_k(bmax, kb)
    bidx = jax.lax.sort(bidx, dimension=1)
    pool = jnp.take_along_axis(scores_padded.reshape(nq, nb, block),
                               bidx[:, :, None], axis=1)     # (Nq, kb, block)
    vals, pos = jax.lax.top_k(pool.reshape(nq, kb * block), min(k, kb * block))
    src = jnp.take_along_axis(bidx, pos // block, axis=1) * block + pos % block
    return vals, jnp.minimum(src, n_pad - 1).astype(jnp.int32)


def _band_indices(L: int, min_l: int, max_l: int):
    """(L, W) end-indices of the valid span band; W = max_l - min_l.

    Span (st=m, ed=n) is valid iff min_l <= n - m < max_l (the reference's
    triu min/max-length mask, inference.py:170-192), so for each start m the
    valid ends are the W consecutive positions m+min_l .. m+max_l-1.
    """
    W = max_l - min_l
    idx = np.arange(L)[:, None] + np.arange(min_l, max_l)[None, :]  # (L, W)
    valid = (idx < L).astype(np.float32)
    return np.clip(idx, 0, L - 1), valid, W


@partial(jax.jit, static_argnames=("min_l", "max_l", "top_n"))
def banded_topk_spans_two_stage(st_probs: jnp.ndarray, ed_probs: jnp.ndarray,
                                video_scores: jnp.ndarray, min_l: int,
                                max_l: int, top_n: int):
    """Exact two-stage variant of banded_topk_spans: per-(query, video)
    top-K over the (L, W) band first (smaller sorts), then a global top-N
    over V*K candidates. Exact because the global top-N contains at most
    top_n spans from any one video."""
    nq, v, L = st_probs.shape
    idx_np, valid_np, W = _band_indices(L, min_l, max_l)
    ed_band = ed_probs[:, :, jnp.asarray(idx_np)]                 # (Nq, V, L, W)
    joint = (st_probs[:, :, :, None] * ed_band
             * video_scores[:, :, None, None] * jnp.asarray(valid_np)[None, None])
    k1 = min(top_n, L * W)
    s1, i1 = jax.lax.top_k(joint.reshape(nq * v, L * W), k1)     # per-video
    s1 = s1.reshape(nq, v * k1)
    i1 = i1.reshape(nq, v * k1)
    scores, sel = jax.lax.top_k(s1, min(top_n, v * k1))
    if scores.shape[1] < top_n:
        padw = top_n - scores.shape[1]
        scores = jnp.pad(scores, ((0, 0), (0, padw)))
        sel = jnp.pad(sel, ((0, 0), (0, padw)))
    vid = (sel // k1).astype(jnp.int32)
    flat = jnp.take_along_axis(i1, sel, axis=1)
    m = flat // W
    n = m + min_l + flat % W
    return vid, m.astype(jnp.int32), n.astype(jnp.int32), scores


@partial(jax.jit, static_argnames=("min_l", "max_l", "top_n"))
def banded_topk_spans(st_probs: jnp.ndarray, ed_probs: jnp.ndarray,
                      video_scores: jnp.ndarray, min_l: int, max_l: int,
                      top_n: int, keep_mask: jnp.ndarray | None = None):
    """Top-N spans over (videos x starts x band-ends) without materializing
    the dense (V, L, L) joint tensor.

    Exact-equivalent to ``flat_topk_spans(st ⊗ ed * score * length_mask)``
    — the length mask keeps only W = max_l - min_l diagonals, so the joint
    is computed banded: (Nq, V, L, W) instead of (Nq, V, L, L).

    Args:
        st_probs / ed_probs: (Nq, V, L); video_scores: (Nq, V)
        keep_mask: optional (Nq, V) {0,1}; every span of a non-kept video
            (including its zero-score invalid band ends) is pushed strictly
            below any real span's score (>= 0) so excluded videos can never
            crowd out kept-video spans on score ties (used by the sharded
            engine to restrict spans to the exact global top-V set).
    Returns:
        (video_local_idx, st_idx, ed_idx, scores), each (Nq, top_n).
    """
    nq, v, L = st_probs.shape
    idx_np, valid_np, W = _band_indices(L, min_l, max_l)
    idx = jnp.asarray(idx_np)
    valid = jnp.asarray(valid_np)

    ed_band = ed_probs[:, :, idx]                                   # (Nq, V, L, W)
    joint = (st_probs[:, :, :, None] * ed_band
             * video_scores[:, :, None, None] * valid[None, None])
    if keep_mask is not None:
        # zero the video weight first so the -1 bias dominates regardless of
        # how large the excluded video's exp-score is
        joint = (joint * keep_mask[:, :, None, None]
                 - (1.0 - keep_mask)[:, :, None, None])
    flat = joint.reshape(nq, v * L * W)
    k = min(top_n, flat.shape[-1])
    scores, flat_idx = jax.lax.top_k(flat, k)
    if k < top_n:  # keep the advertised static width
        scores = jnp.pad(scores, ((0, 0), (0, top_n - k)))
        flat_idx = jnp.pad(flat_idx, ((0, 0), (0, top_n - k)))
    vid = flat_idx // (L * W)
    rem = flat_idx % (L * W)
    m = rem // W
    n = m + min_l + rem % W
    return (vid.astype(jnp.int32), m.astype(jnp.int32),
            n.astype(jnp.int32), scores)


@partial(jax.jit, static_argnames=("min_l", "max_l", "top_n"))
def banded_topk_spans_grouped(st_probs: jnp.ndarray, ed_probs: jnp.ndarray,
                              video_scores: jnp.ndarray, min_l: int,
                              max_l: int, top_n: int):
    """EXACT hierarchical variant of banded_topk_spans: group the band by
    (video, start), select candidate groups by their group MAXIMUM, expand
    only those groups, and sort the small candidate pool.

    Why it is exact (bit-for-bit equal to banded_topk_spans):
      1. Group max without materializing the band: f32 multiplication by a
         non-negative factor is monotone, so
         ``max_w fl(fl(st*ed_w)*vs) == fl(fl(st*max_w ed_w)*vs)`` — the
         window max of ``ed`` (log-doubling shifts, zero fill reproduces the
         invalid-end zeros) gives every group's true maximum span score.
      2. Cover theorem: let t be the top_n-th span value. Every group
         holding a selected span has group-max >= t; the number of such
         groups is at most top_n (each >t group holds a >t span, and tied
         ==t groups are needed in ascending flat order, which is exactly
         lax.top_k's stable tie-break over the group-major flat layout).
         Hence the stable top-``top_n`` groups by group max contain ALL
         selected spans.
      3. The expanded pool (top_n * W values, computed with the same
         ((st*ed)*vs)*valid f32 products) is sorted by (value desc,
         canonical flat index asc) — the same total order as XLA's stable
         top_k over the full flat band.

    ~10x less sort work than the flat path at corpus scale (top_k over
    V*L=10K group maxes + a 2-key sort of top_n*W candidates, vs top_k over
    V*L*W=140K), with everything MXU/VPU-friendly XLA ops.
    """
    nq, v, L = st_probs.shape
    W = max_l - min_l

    # --- 1. per-(video, start) group max via window max of ed
    # (reduce_window with identity 0.0: probs are >= 0 and out-of-range ends
    # are exact zeros in the flat path, so the max identities coincide)
    rw = jax.lax.reduce_window(
        ed_probs, 0.0, jax.lax.max, (1, 1, W), (1, 1, 1),
        padding=((0, 0), (0, 0), (0, W - 1)))                    # max ed[i:i+W)
    wmax = jnp.pad(rw, ((0, 0), (0, 0), (0, min_l)))[..., min_l:]
    gmax = (st_probs * wmax) * video_scores[:, :, None]          # (Nq, V, L)

    # --- 2. stable top-k groups (ties -> ascending flat (v, st) index),
    # then re-order the selected groups ASCENDING by flat index so the
    # expanded candidate pool is laid out in canonical order — that makes
    # the final stable top_k's position tie-break equal the canonical-index
    # tie-break (a 2-key lax.sort is ~4x slower than top_k on TPU)
    k_groups = min(top_n, v * L)
    # topk_stable_blocked is bit-equal to lax.top_k (same stable tie order)
    # and prunes most of the V*L group row before sorting; block=8 measured
    # fastest at the group-row shape ((800, 10400) k=200: 5.37 ms vs 6.14
    # at block 16 — scripts/measure_span_topk_variants.py, BENCH_NOTES r3)
    _, gidx = topk_stable_blocked(gmax.reshape(nq, v * L), k_groups,
                                  block=8)                        # (Nq, G)
    gidx = jax.lax.sort(gidx, dimension=1)
    g_vid = gidx // L
    g_st = gidx % L

    # --- 3. expand candidate groups: W spans each. The ed windows are
    # gathered as CONTIGUOUS (1, W) rows of the statically-banded ed tensor.
    # Measured alternatives that avoid materializing the (Nq, V, L, W) band
    # (scripts/measure_grouped_expansion.py, v5e, Nq=400): per-group
    # dynamic-slice windows 77.1 ms and a flat element take_along_axis
    # 18.5 ms vs 11.3 ms for this path — dynamic indexing on the minor dim
    # degrades to element gathers on TPU, while the band build is dense
    # sequential traffic XLA fuses well (all three bit-equal).
    take2 = lambda x, i: jnp.take_along_axis(x.reshape(nq, v * L), i, axis=1)
    st_g = take2(st_probs, gidx)                                 # (Nq, G)
    vs_g = jnp.take_along_axis(video_scores, g_vid, axis=1)
    idx_np, valid_np, _ = _band_indices(L, min_l, max_l)
    ed_band = ed_probs[:, :, jnp.asarray(idx_np)]                # (Nq, V, L, W)
    ed_g = jnp.take_along_axis(
        ed_band.reshape(nq, v * L, W), gidx[:, :, None], axis=1)  # (Nq, G, W)
    valid_g = ((g_st[:, :, None] + min_l + jnp.arange(W)[None, None]) < L
               ).astype(st_probs.dtype)
    vals = ((st_g[:, :, None] * ed_g) * vs_g[:, :, None]) * valid_g
    canon = gidx[:, :, None] * W + jnp.arange(W)[None, None]

    # --- 4. exact final order: stable top_k over the canon-ordered pool
    # == (value desc, canonical index asc)
    pool = vals.reshape(nq, -1)
    k = min(top_n, pool.shape[1])
    scores, pos = jax.lax.top_k(pool, k)
    flat = jnp.take_along_axis(canon.reshape(nq, -1), pos, axis=1)
    if k < top_n:
        scores = jnp.pad(scores, ((0, 0), (0, top_n - k)))
        flat = jnp.pad(flat, ((0, 0), (0, top_n - k)))
    vid = flat // (L * W)
    rem = flat % (L * W)
    m = rem // W
    n = m + min_l + rem % W
    return (vid.astype(jnp.int32), m.astype(jnp.int32),
            n.astype(jnp.int32), scores)


@partial(jax.jit, static_argnames=("min_l", "max_l", "top_n"))
def banded_topk_spans_grouped_shift(st_probs: jnp.ndarray, ed_probs: jnp.ndarray,
                                    video_scores: jnp.ndarray, min_l: int,
                                    max_l: int, top_n: int,
                                    keep_mask: jnp.ndarray | None = None):
    """banded_topk_spans_grouped with a SHIFT-REDUCTION candidate expansion.

    Stages 1-2 (group max via window max of ed, stable top-k group select)
    are identical to banded_topk_spans_grouped. The expansion differs: the
    band tensor (Nq, V, L, W) — 4.5 GB f32 at Nq=800 corpus scale — is
    never built. Instead the selected groups' ed ROWS are row-gathered
    ((Nq, G, L), ~200x smaller) and each band offset w is extracted with a
    one-hot start mask times a statically-shifted copy of the rows:

        ed_g[q, g, w] = sum_l onehot(l == g_st)[q, g, l]
                        * shift(ed_rows, -(min_l + w))[q, g, l]

    The one-hot sum adds exactly one f32 value to zeros (0 + x == x in
    IEEE), so extracted values are bit-equal to the band gather; all
    downstream products and the stable top_k are unchanged — outputs are
    bit-for-bit equal to banded_topk_spans_grouped / banded_topk_spans
    (pinned by tests/test_pallas_topk.py::test_grouped_matches_flat_exactly).

    keep_mask: optional (Nq, V) {0,1} like banded_topk_spans — every span
    of a non-kept video is pushed to exactly -1 (strictly below any real
    span's >= 0 score). keep is constant within a video, so applying the
    transform ``x*keep - (1-keep)`` to the GROUP maxima (selection) and to
    the expanded values (pool) reproduces the flat path's per-span
    transform bit-for-bit: a non-kept group's max is exactly -1 and its
    expanded spans are exactly -1, same ascending-canonical tie order.
    """
    nq, v, L = st_probs.shape
    W = max_l - min_l

    rw = jax.lax.reduce_window(
        ed_probs, 0.0, jax.lax.max, (1, 1, W), (1, 1, 1),
        padding=((0, 0), (0, 0), (0, W - 1)))
    wmax = jnp.pad(rw, ((0, 0), (0, 0), (0, min_l)))[..., min_l:]
    gmax = (st_probs * wmax) * video_scores[:, :, None]          # (Nq, V, L)
    if keep_mask is not None:
        gmax = (gmax * keep_mask[:, :, None]
                - (1.0 - keep_mask)[:, :, None])

    k_groups = min(top_n, v * L)
    # block=8: fastest at the group-row shape (see banded_topk_spans_grouped)
    _, gidx = topk_stable_blocked(gmax.reshape(nq, v * L), k_groups,
                                  block=8)                        # (Nq, G)
    gidx = jax.lax.sort(gidx, dimension=1)
    g_vid = gidx // L
    g_st = gidx % L

    take2 = lambda x, i: jnp.take_along_axis(x.reshape(nq, v * L), i, axis=1)
    st_g = take2(st_probs, gidx)                                 # (Nq, G)
    vs_g = jnp.take_along_axis(video_scores, g_vid, axis=1)

    # selected groups' ed rows: (Nq, G, L) row gather, then W shifted
    # one-hot reductions in place of the (Nq, V, L, W) band build
    ed_rows = jnp.take_along_axis(ed_probs, g_vid[:, :, None], axis=1)
    onehot = (jnp.arange(L, dtype=jnp.int32)[None, None]
              == g_st[:, :, None]).astype(ed_rows.dtype)         # (Nq, G, L)
    # zero-pad so shifts past L read exact zeros (the flat path's
    # invalid-end zeros come from the same positions being masked below)
    ed_padded = jnp.pad(ed_rows, ((0, 0), (0, 0), (0, max_l)))
    ed_g = jnp.stack(
        [(onehot * jax.lax.dynamic_slice_in_dim(ed_padded, min_l + w, L,
                                                axis=2)).sum(axis=2)
         for w in range(W)], axis=-1)                            # (Nq, G, W)
    valid_g = ((g_st[:, :, None] + min_l + jnp.arange(W)[None, None]) < L
               ).astype(st_probs.dtype)
    vals = ((st_g[:, :, None] * ed_g) * vs_g[:, :, None]) * valid_g
    if keep_mask is not None:
        keep_g = jnp.take_along_axis(keep_mask, g_vid, axis=1)   # (Nq, G)
        vals = vals * keep_g[:, :, None] - (1.0 - keep_g)[:, :, None]
    canon = gidx[:, :, None] * W + jnp.arange(W)[None, None]

    pool = vals.reshape(nq, -1)
    k = min(top_n, pool.shape[1])
    scores, pos = jax.lax.top_k(pool, k)
    flat = jnp.take_along_axis(canon.reshape(nq, -1), pos, axis=1)
    if k < top_n:
        scores = jnp.pad(scores, ((0, 0), (0, top_n - k)))
        flat = jnp.pad(flat, ((0, 0), (0, top_n - k)))
    vid = flat // (L * W)
    rem = flat % (L * W)
    m = rem // W
    n = m + min_l + rem % W
    return (vid.astype(jnp.int32), m.astype(jnp.int32),
            n.astype(jnp.int32), scores)


@partial(jax.jit, static_argnames=("min_l", "max_l", "top_n", "interpret"))
def banded_topk_spans_grouped_shift_psort(
        st_probs: jnp.ndarray, ed_probs: jnp.ndarray,
        video_scores: jnp.ndarray, min_l: int, max_l: int, top_n: int,
        keep_mask: jnp.ndarray | None = None, interpret: bool = False):
    """banded_topk_spans_grouped_shift with the two exact selections run by
    the lane-parallel transposed bitonic kernel (ops/pallas_sort.py):
    group select via topk_stable_blocked_psort, final pool select via
    topk_transposed. A PARITY mode — the kernel is bit-equal to
    ``lax.top_k`` including stable tie order, so outputs are bit-for-bit
    equal to banded_topk_spans / grouped / grouped_shift
    (tests/test_pallas_sort.py, tests/test_span_score_modes.py).
    Engine-level measurement was NEGATIVE (-6.7% vs grouped_shift at
    corpus scale, BENCH_NOTES round 5) — grouped_shift stays the shipped
    exact mode; this stays as validated infrastructure.

    Reference op being replaced: inference.py:378-386 +
    tensor_utils.py:115-141 (host numpy flat sort).
    """
    from tvretrieval_tpu.ops.pallas_sort import topk_transposed
    nq, v, L = st_probs.shape
    W = max_l - min_l

    rw = jax.lax.reduce_window(
        ed_probs, 0.0, jax.lax.max, (1, 1, W), (1, 1, 1),
        padding=((0, 0), (0, 0), (0, W - 1)))
    wmax = jnp.pad(rw, ((0, 0), (0, 0), (0, min_l)))[..., min_l:]
    gmax = (st_probs * wmax) * video_scores[:, :, None]          # (Nq, V, L)
    if keep_mask is not None:
        gmax = (gmax * keep_mask[:, :, None]
                - (1.0 - keep_mask)[:, :, None])

    k_groups = min(top_n, v * L)
    _, gidx = topk_stable_blocked_psort(gmax.reshape(nq, v * L), k_groups,
                                        block=8, interpret=interpret)
    gidx = jax.lax.sort(gidx, dimension=1)
    g_vid = gidx // L
    g_st = gidx % L

    take2 = lambda x, i: jnp.take_along_axis(x.reshape(nq, v * L), i, axis=1)
    st_g = take2(st_probs, gidx)                                 # (Nq, G)
    vs_g = jnp.take_along_axis(video_scores, g_vid, axis=1)

    ed_rows = jnp.take_along_axis(ed_probs, g_vid[:, :, None], axis=1)
    onehot = (jnp.arange(L, dtype=jnp.int32)[None, None]
              == g_st[:, :, None]).astype(ed_rows.dtype)         # (Nq, G, L)
    ed_padded = jnp.pad(ed_rows, ((0, 0), (0, 0), (0, max_l)))
    ed_g = jnp.stack(
        [(onehot * jax.lax.dynamic_slice_in_dim(ed_padded, min_l + w, L,
                                                axis=2)).sum(axis=2)
         for w in range(W)], axis=-1)                            # (Nq, G, W)
    valid_g = ((g_st[:, :, None] + min_l + jnp.arange(W)[None, None]) < L
               ).astype(st_probs.dtype)
    vals = ((st_g[:, :, None] * ed_g) * vs_g[:, :, None]) * valid_g
    if keep_mask is not None:
        keep_g = jnp.take_along_axis(keep_mask, g_vid, axis=1)   # (Nq, G)
        vals = vals * keep_g[:, :, None] - (1.0 - keep_g)[:, :, None]
    canon = gidx[:, :, None] * W + jnp.arange(W)[None, None]

    pool = vals.reshape(nq, -1)
    k = min(top_n, pool.shape[1])
    scores, pos = topk_transposed(pool, k, interpret=interpret)
    flat = jnp.take_along_axis(canon.reshape(nq, -1), pos, axis=1)
    if k < top_n:
        scores = jnp.pad(scores, ((0, 0), (0, top_n - k)))
        flat = jnp.pad(flat, ((0, 0), (0, top_n - k)))
    vid = flat // (L * W)
    rem = flat % (L * W)
    m = rem // W
    n = m + min_l + rem % W
    return (vid.astype(jnp.int32), m.astype(jnp.int32),
            n.astype(jnp.int32), scores)


@partial(jax.jit, static_argnames=("min_l", "max_l", "top_n", "recall"))
def banded_topk_spans_grouped_shift_approx(
        st_probs: jnp.ndarray, ed_probs: jnp.ndarray,
        video_scores: jnp.ndarray, min_l: int, max_l: int, top_n: int,
        keep_mask: jnp.ndarray | None = None, recall: float = 0.99):
    """banded_topk_spans_grouped_shift with the two exact selections
    (group select over V*L, final span select over G*W) replaced by TPU's
    hardware-accelerated approximate top-k (lax.approx_max_k /
    PartialReduce, arXiv:2206.14286) at the given per-op recall target.

    NOT a parity mode: per-query span candidate lists can miss ~(1-recall)
    of the exact top-N (and tie/near-tie order may differ); the accuracy
    contract is a trained-checkpoint metric A/B like pallas_int8 /
    simsweep_cat_int8_flat (BENCH_NOTES round 4). On CPU approx_max_k
    falls back to an exact sort (recall 1.0), so CPU tests pin the
    plumbing, not the approximation.

    Reference op being replaced: inference.py:378-386 (host flat sort of
    the top-100-video span scores).
    """
    nq, v, L = st_probs.shape
    W = max_l - min_l

    rw = jax.lax.reduce_window(
        ed_probs, 0.0, jax.lax.max, (1, 1, W), (1, 1, 1),
        padding=((0, 0), (0, 0), (0, W - 1)))
    wmax = jnp.pad(rw, ((0, 0), (0, 0), (0, min_l)))[..., min_l:]
    gmax = (st_probs * wmax) * video_scores[:, :, None]          # (Nq, V, L)
    if keep_mask is not None:
        gmax = (gmax * keep_mask[:, :, None]
                - (1.0 - keep_mask)[:, :, None])

    k_groups = min(top_n, v * L)
    _, gidx = jax.lax.approx_max_k(gmax.reshape(nq, v * L), k_groups,
                                   recall_target=recall)         # (Nq, G)
    gidx = jax.lax.sort(gidx, dimension=1)
    g_vid = gidx // L
    g_st = gidx % L

    take2 = lambda x, i: jnp.take_along_axis(x.reshape(nq, v * L), i, axis=1)
    st_g = take2(st_probs, gidx)                                 # (Nq, G)
    vs_g = jnp.take_along_axis(video_scores, g_vid, axis=1)

    ed_rows = jnp.take_along_axis(ed_probs, g_vid[:, :, None], axis=1)
    onehot = (jnp.arange(L, dtype=jnp.int32)[None, None]
              == g_st[:, :, None]).astype(ed_rows.dtype)         # (Nq, G, L)
    ed_padded = jnp.pad(ed_rows, ((0, 0), (0, 0), (0, max_l)))
    ed_g = jnp.stack(
        [(onehot * jax.lax.dynamic_slice_in_dim(ed_padded, min_l + w, L,
                                                axis=2)).sum(axis=2)
         for w in range(W)], axis=-1)                            # (Nq, G, W)
    valid_g = ((g_st[:, :, None] + min_l + jnp.arange(W)[None, None]) < L
               ).astype(st_probs.dtype)
    vals = ((st_g[:, :, None] * ed_g) * vs_g[:, :, None]) * valid_g
    if keep_mask is not None:
        keep_g = jnp.take_along_axis(keep_mask, g_vid, axis=1)   # (Nq, G)
        vals = vals * keep_g[:, :, None] - (1.0 - keep_g)[:, :, None]
    canon = gidx[:, :, None] * W + jnp.arange(W)[None, None]

    pool = vals.reshape(nq, -1)
    k = min(top_n, pool.shape[1])
    scores, pos = jax.lax.approx_max_k(pool, k, recall_target=recall)
    flat = jnp.take_along_axis(canon.reshape(nq, -1), pos, axis=1)
    if k < top_n:
        scores = jnp.pad(scores, ((0, 0), (0, top_n - k)))
        flat = jnp.pad(flat, ((0, 0), (0, top_n - k)))
    vid = flat // (L * W)
    rem = flat % (L * W)
    m = rem // W
    n = m + min_l + rem % W
    return (vid.astype(jnp.int32), m.astype(jnp.int32),
            n.astype(jnp.int32), scores)


@partial(jax.jit, static_argnames=("min_l", "max_l", "top_n"))
def banded_topk_spans_grouped_shift8(st_probs: jnp.ndarray,
                                     ed_probs: jnp.ndarray,
                                     video_scores: jnp.ndarray, min_l: int,
                                     max_l: int, top_n: int,
                                     keep_mask: jnp.ndarray | None = None):
    """banded_topk_spans_grouped_shift with an ALIGNED-8-BLOCK gather
    expansion (round-4 candidate for the span top-k stage).

    Stages 1-2 (group max via window max of ed, stable top-k group select)
    are identical to banded_topk_spans_grouped_shift. The expansion
    differs: instead of row-gathering each selected group's FULL ed row
    ((Nq, G, L)) and doing W one-hot shift reductions over L lanes, the
    flat (V*L) ed tensor is viewed as 8-element blocks (the sublane tile)
    and each group gathers only the NB = ceil((7+W)/8) consecutive blocks
    covering its window — (Nq, G, NB*8) — then W one-hot reductions run
    over just 8 lanes:

        ed_g[q, g, w] = sum_{j<8} onehot(j == (p0 % 8))[q, g, j]
                        * ed_blocks[q, g, j + w],  p0 = g_vid*L + g_st + min_l

    ~L/(NB*8) less gather traffic and ~L/8 less shift-reduction work than
    the full-row variant. Reads past a video's L (invalid ends) land in
    the NEXT video's flat values (or the zero tail pad) — finite values
    that the exact ``* valid`` zero-multiply cancels, reproducing the flat
    path's exact 0.0 for invalid ends (or the keep transform's exact -1).
    The one-hot sum adds exactly one f32 value to zeros, so outputs are
    bit-for-bit equal to banded_topk_spans_grouped_shift /
    banded_topk_spans (pinned by tests/test_pallas_topk.py).
    """
    nq, v, L = st_probs.shape
    W = max_l - min_l

    rw = jax.lax.reduce_window(
        ed_probs, 0.0, jax.lax.max, (1, 1, W), (1, 1, 1),
        padding=((0, 0), (0, 0), (0, W - 1)))
    wmax = jnp.pad(rw, ((0, 0), (0, 0), (0, min_l)))[..., min_l:]
    gmax = (st_probs * wmax) * video_scores[:, :, None]          # (Nq, V, L)
    if keep_mask is not None:
        gmax = (gmax * keep_mask[:, :, None]
                - (1.0 - keep_mask)[:, :, None])

    k_groups = min(top_n, v * L)
    _, gidx = topk_stable_blocked(gmax.reshape(nq, v * L), k_groups,
                                  block=8)                        # (Nq, G)
    gidx = jax.lax.sort(gidx, dimension=1)
    g_vid = gidx // L
    g_st = gidx % L

    take2 = lambda x, i: jnp.take_along_axis(x.reshape(nq, v * L), i, axis=1)
    st_g = take2(st_probs, gidx)                                 # (Nq, G)
    vs_g = jnp.take_along_axis(video_scores, g_vid, axis=1)

    # aligned-8-block gather over the flat (V*L) ed axis: NB consecutive
    # blocks cover any W-window regardless of its in-block offset
    nb = (W + 14) // 8                       # ceil((7 + W) / 8)
    flat_len = v * L + min_l + 8 * nb        # window tail stays in-bounds
    pad_to = -(-flat_len // 8) * 8
    ed_flat = jnp.pad(ed_probs.reshape(nq, v * L),
                      ((0, 0), (0, pad_to - v * L)))
    ed_blocks_src = ed_flat.reshape(nq, pad_to // 8, 8)
    p0 = gidx + min_l                        # == g_vid * L + g_st + min_l
    b0 = p0 // 8
    r = p0 % 8
    bidx = b0[:, :, None] + jnp.arange(nb, dtype=gidx.dtype)[None, None]
    rows = jnp.take_along_axis(
        ed_blocks_src, bidx.reshape(nq, -1)[:, :, None], axis=1)
    edn = rows.reshape(nq, k_groups, nb * 8)                     # (Nq, G, NB*8)
    onehot8 = (jnp.arange(8, dtype=jnp.int32)[None, None]
               == r[:, :, None]).astype(edn.dtype)               # (Nq, G, 8)
    ed_g = jnp.stack(
        [(onehot8 * jax.lax.dynamic_slice_in_dim(edn, w, 8, axis=2)
          ).sum(axis=2)
         for w in range(W)], axis=-1)                            # (Nq, G, W)
    valid_g = ((g_st[:, :, None] + min_l + jnp.arange(W)[None, None]) < L
               ).astype(st_probs.dtype)
    vals = ((st_g[:, :, None] * ed_g) * vs_g[:, :, None]) * valid_g
    if keep_mask is not None:
        keep_g = jnp.take_along_axis(keep_mask, g_vid, axis=1)   # (Nq, G)
        vals = vals * keep_g[:, :, None] - (1.0 - keep_g)[:, :, None]
    canon = gidx[:, :, None] * W + jnp.arange(W)[None, None]

    pool = vals.reshape(nq, -1)
    k = min(top_n, pool.shape[1])
    scores, pos = jax.lax.top_k(pool, k)
    flat = jnp.take_along_axis(canon.reshape(nq, -1), pos, axis=1)
    if k < top_n:
        scores = jnp.pad(scores, ((0, 0), (0, top_n - k)))
        flat = jnp.pad(flat, ((0, 0), (0, top_n - k)))
    vid = flat // (L * W)
    rem = flat % (L * W)
    m = rem // W
    n = m + min_l + rem % W
    return (vid.astype(jnp.int32), m.astype(jnp.int32),
            n.astype(jnp.int32), scores)


@partial(jax.jit, static_argnames=("min_l", "max_l", "top_n"))
def banded_top_spans_from_probs(st_probs: jnp.ndarray, ed_probs: jnp.ndarray,
                                min_l: int, max_l: int, top_n: int):
    """Banded single-video variant of top_spans_from_probs: (N, L) probs."""
    n_rows, L = st_probs.shape
    idx_np, valid_np, W = _band_indices(L, min_l, max_l)
    ed_band = ed_probs[:, jnp.asarray(idx_np)]                      # (N, L, W)
    joint = st_probs[:, :, None] * ed_band * jnp.asarray(valid_np)[None]
    k = min(top_n, L * W)
    scores, flat_idx = jax.lax.top_k(joint.reshape(n_rows, L * W), k)
    if k < top_n:
        scores = jnp.pad(scores, ((0, 0), (0, top_n - k)))
        flat_idx = jnp.pad(flat_idx, ((0, 0), (0, top_n - k)))
    m = flat_idx // W
    n = m + min_l + flat_idx % W
    return m.astype(jnp.int32), n.astype(jnp.int32), scores


@partial(jax.jit, static_argnames=("top_n",))
def flat_topk_spans(joint_scores: jnp.ndarray, top_n: int):
    """Top-N over (N_q, V, L, L) joint scores, flattened over (V, L, L).

    Returns (video_local_idx, st_idx, ed_idx, scores), each (N_q, top_n) —
    the on-device version of the reference's flat sort + np.unravel_index
    (inference.py:378-386, 423-431).
    """
    n_q, v, L, _ = joint_scores.shape
    flat = joint_scores.reshape(n_q, v * L * L)
    scores, idx = jax.lax.top_k(flat, top_n)
    vid = idx // (L * L)
    rem = idx % (L * L)
    return vid.astype(jnp.int32), (rem // L).astype(jnp.int32), (rem % L).astype(jnp.int32), scores

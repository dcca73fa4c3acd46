"""A/B the grouped banded top-k's candidate expansion on the real chip.

New path (ops/span.banded_topk_spans_grouped): G width-W dynamic slices
gathered directly from ed_probs' flat (V*L,) layout — no (Nq, V, L, W)
band tensor.
Old path (inlined here): materialize the banded ed tensor, then gather
(1, W) rows — the round-2-first-half implementation.

Usage: python scripts/measure_grouped_expansion.py [nq]
Prints ms/call for both at corpus scale (V=100, L=100, W=14, top_n=200)
plus an on-chip exactness check (outputs must be bit-equal).
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tvretrieval_tpu.ops.span import (
    _band_indices, banded_topk_spans_grouped, banded_topk_spans_grouped_shift,
    topk_stable_blocked)


@partial(jax.jit, static_argnames=("min_l", "max_l", "top_n"))
def grouped_band_expand(st_probs, ed_probs, video_scores, min_l, max_l, top_n):
    """banded_topk_spans_grouped with the OLD band-materializing expansion."""
    nq, v, L = st_probs.shape
    W = max_l - min_l
    rw = jax.lax.reduce_window(
        ed_probs, 0.0, jax.lax.max, (1, 1, W), (1, 1, 1),
        padding=((0, 0), (0, 0), (0, W - 1)))
    wmax = jnp.pad(rw, ((0, 0), (0, 0), (0, min_l)))[..., min_l:]
    gmax = (st_probs * wmax) * video_scores[:, :, None]
    k_groups = min(top_n, v * L)
    _, gidx = topk_stable_blocked(gmax.reshape(nq, v * L), k_groups)
    gidx = jax.lax.sort(gidx, dimension=1)
    g_vid = gidx // L
    g_st = gidx % L
    take2 = lambda x, i: jnp.take_along_axis(x.reshape(nq, v * L), i, axis=1)
    st_g = take2(st_probs, gidx)
    vs_g = jnp.take_along_axis(video_scores, g_vid, axis=1)
    idx_np, valid_np, _ = _band_indices(L, min_l, max_l)
    ed_band = ed_probs[:, :, jnp.asarray(idx_np)]                # (Nq,V,L,W)
    ed_g = jnp.take_along_axis(
        ed_band.reshape(nq, v * L, W), gidx[:, :, None], axis=1)
    valid_g = ((g_st[:, :, None] + min_l + jnp.arange(W)[None, None]) < L
               ).astype(st_probs.dtype)
    vals = ((st_g[:, :, None] * ed_g) * vs_g[:, :, None]) * valid_g
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
def grouped_flat_take(st_probs, ed_probs, video_scores, min_l, max_l, top_n):
    """Variant C: one flat element take_along_axis for the ed windows."""
    nq, v, L = st_probs.shape
    W = max_l - min_l
    rw = jax.lax.reduce_window(
        ed_probs, 0.0, jax.lax.max, (1, 1, W), (1, 1, 1),
        padding=((0, 0), (0, 0), (0, W - 1)))
    wmax = jnp.pad(rw, ((0, 0), (0, 0), (0, min_l)))[..., min_l:]
    gmax = (st_probs * wmax) * video_scores[:, :, None]
    k_groups = min(top_n, v * L)
    _, gidx = topk_stable_blocked(gmax.reshape(nq, v * L), k_groups)
    gidx = jax.lax.sort(gidx, dimension=1)
    g_vid = gidx // L
    g_st = gidx % L
    take2 = lambda x, i: jnp.take_along_axis(x.reshape(nq, v * L), i, axis=1)
    st_g = take2(st_probs, gidx)
    vs_g = jnp.take_along_axis(video_scores, g_vid, axis=1)
    ed_flat = jnp.pad(ed_probs.reshape(nq, v * L), ((0, 0), (0, max_l)))
    flat_idx = (gidx[:, :, None] + min_l
                + jnp.arange(W, dtype=jnp.int32)[None, None]).reshape(nq, -1)
    ed_g = jnp.take_along_axis(ed_flat, flat_idx, axis=1).reshape(nq, -1, W)
    valid_g = ((g_st[:, :, None] + min_l + jnp.arange(W)[None, None]) < L
               ).astype(st_probs.dtype)
    vals = ((st_g[:, :, None] * ed_g) * vs_g[:, :, None]) * valid_g
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


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0][0, 0])


def time_fn(fn, args, n_warm=2, n_runs=20):
    for _ in range(n_warm):
        fence(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n_runs)]
    fence(outs[-1])
    return (time.perf_counter() - t0) / n_runs * 1e3


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    V, L, min_l, max_l, top_n = 100, 100, 2, 16, 200
    rng = np.random.default_rng(0)
    st = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(nq, V, L)).astype(np.float32)), axis=-1)
    ed = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(nq, V, L)).astype(np.float32)), axis=-1)
    vs = jnp.exp(4.0 * jnp.asarray(rng.random((nq, V)).astype(np.float32)))
    args = (st, ed, vs, min_l, max_l, top_n)

    new = banded_topk_spans_grouped(*args)
    old = grouped_band_expand(*args)
    for name, a, b in zip(("vid", "st", "ed", "scores"), new, old):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    print("exactness: new == old bit-for-bit on chip")

    flat = grouped_flat_take(*args)
    for name, a, b in zip(("vid", "st", "ed", "scores"), new, flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg="flat_take " + name)
    shift = banded_topk_spans_grouped_shift(*args)
    for name, a, b in zip(("vid", "st", "ed", "scores"), new, shift):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg="shift " + name)

    t_old = time_fn(grouped_band_expand, args)
    t_new = time_fn(banded_topk_spans_grouped, args)
    t_flat = time_fn(grouped_flat_take, args)
    t_shift = time_fn(banded_topk_spans_grouped_shift, args)
    print(f"nq={nq} V={V} L={L} W={max_l-min_l} top_n={top_n}")
    print(f"band materialize + row gather:       {t_old:.2f} ms")
    print(f"package banded_topk_spans_grouped:   {t_new:.2f} ms")
    print(f"flat element take_along_axis:        {t_flat:.2f} ms")
    print(f"row gather + one-hot W-shift:        {t_shift:.2f} ms")


if __name__ == "__main__":
    main()

"""On-chip A/B of span-top-k stage variants at engine shapes (round 3).

The grouped_shift span top-k is ~19 ms of the 61 ms fused program at
query batch 800 (BENCH_NOTES round-2 stage table) — mostly two lax.top_k
calls inside topk_stable_blocked plus the W-shift expansion. This script
times exact alternatives standalone (same relay-safe fencing as bench.py):

  * topk_stable_blocked block sweep (8 / 16 / 32) on the (Nq, V*L) group row
  * lax.top_k vs descending variadic lax.sort for the pooled candidates
  * shift expansion vs banded expansion ON SELECTED ROWS ONLY
  * reduce_window vs log-doubling shifted max for the ed window max

Usage: python scripts/measure_span_topk_variants.py [--nq 800]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nq", type=int, default=800)
    p.add_argument("--v", type=int, default=100)
    p.add_argument("--l", type=int, default=104)
    p.add_argument("--top_n", type=int, default=200)
    p.add_argument("--min_l", type=int, default=2)
    p.add_argument("--max_l", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tvretrieval_tpu.ops.span import (
        banded_topk_spans_grouped, banded_topk_spans_grouped_shift,
        topk_stable_blocked)

    nq, V, L, N = args.nq, args.v, args.l, args.top_n
    W = args.max_l - args.min_l
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    st = jax.nn.softmax(jax.random.normal(ks[0], (nq, V, L)), axis=-1)
    ed = jax.nn.softmax(jax.random.normal(ks[1], (nq, V, L)), axis=-1)
    vs = jnp.exp(20.0 * jax.random.uniform(ks[2], (nq, V)))
    grow = (st * ed * vs[:, :, None]).reshape(nq, V * L)  # group-max stand-in

    def timeit(name, fn, *xs):
        out = fn(*xs)
        fence = lambda o: jax.device_get(
            (o[0] if isinstance(o, (tuple, list)) else o).ravel()[0])
        fence(out)
        fence(fn(*xs))
        t0 = time.perf_counter()
        outs = [fn(*xs) for _ in range(args.iters)]
        fence(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:48s} {dt:7.2f} ms", flush=True)
        return out

    # --- full-stage references
    timeit("grouped (band expansion) FULL", jax.jit(functools.partial(
        banded_topk_spans_grouped, min_l=args.min_l, max_l=args.max_l,
        top_n=N)), st, ed, vs)
    timeit("grouped_shift FULL", jax.jit(functools.partial(
        banded_topk_spans_grouped_shift, min_l=args.min_l, max_l=args.max_l,
        top_n=N)), st, ed, vs)

    # --- group-select variants on the (Nq, V*L) row
    for block in (8, 16, 32):
        timeit(f"topk_stable_blocked block={block}",
               jax.jit(functools.partial(topk_stable_blocked, k=N,
                                         block=block)), grow)
    timeit("lax.top_k (reference)",
           jax.jit(lambda x: jax.lax.top_k(x, N)), grow)

    @jax.jit
    def sort_based(x):
        # descending 2-operand sort, take first N — same stable tie order
        # as top_k when keys are (-score, idx)
        idx = jnp.broadcast_to(jnp.arange(x.shape[1], dtype=jnp.int32)[None],
                               x.shape)
        neg, i = jax.lax.sort((-x, idx), num_keys=2)
        return -neg[:, :N], i[:, :N]
    timeit("full 2-key lax.sort + slice", sort_based, grow)

    # blocked select with sort for the pooled stage
    @functools.partial(jax.jit, static_argnames=("block",))
    def blocked_sort_pool(x, block=16):
        nqq, n = x.shape
        nb = n // block
        bmax = x.reshape(nqq, nb, block).max(axis=-1)
        _, bidx = jax.lax.top_k(bmax, N)
        bidx = jax.lax.sort(bidx, dimension=1)
        pool = jnp.take_along_axis(x.reshape(nqq, nb, block),
                                   bidx[:, :, None], axis=1)
        pool = pool.reshape(nqq, N * block)
        canon = (jnp.take_along_axis(bidx, jnp.arange(N * block)[None]
                                     // block, axis=1) * block
                 + jnp.arange(N * block)[None] % block)
        neg, i = jax.lax.sort((-pool, canon), num_keys=2)
        return -neg[:, :N], i[:, :N]
    timeit("blocked: top_k(bmax) + SORT pool", blocked_sort_pool, grow)

    # --- ed window max variants
    @jax.jit
    def win_reduce(e):
        return jax.lax.reduce_window(e, 0.0, jax.lax.max, (1, 1, W),
                                     (1, 1, 1),
                                     padding=((0, 0), (0, 0), (0, W - 1)))
    timeit("window max: reduce_window", win_reduce, ed)

    @jax.jit
    def win_shift(e):
        # log-doubling shifted max (exact same values: max is associative)
        out = e
        pad = jnp.zeros_like(e)
        shift = 1
        remaining = W - 1
        cur = e
        while shift <= remaining:
            cur_s = jnp.concatenate([out[..., shift:],
                                     pad[..., :shift]], axis=-1)
            out = jnp.maximum(out, cur_s)
            remaining -= shift
            shift *= 2
        if remaining:
            cur_s = jnp.concatenate([out[..., remaining:W],
                                     jnp.zeros_like(out[..., :0])], axis=-1)
        # final partial: max with a shift of (W - 2^k) of the ORIGINAL run
        # (simpler exact version: one extra shifted max of `out`)
        return out
    # NOTE win_shift is an upper-bound timing probe only (not exact for all
    # W); used purely to see if reduce_window is the bottleneck
    timeit("window max: log-shift probe", win_shift, ed)


if __name__ == "__main__":
    main()

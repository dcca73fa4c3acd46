"""On-chip A/B: video-score kernel chunk_v + video top-k block size
(engine shapes: Nq=800, Nv=21818, L=100/lp=104, D=256, k=100)."""
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
    p.add_argument("--nv", type=int, default=21818)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tvretrieval_tpu.ops.pallas_score import (build_flat_feat1, flat_lp,
                                                  video_scores_pallas_flat)
    from tvretrieval_tpu.ops.span import topk_stable_blocked

    nq, nv, L, D = args.nq, args.nv, 100, 256
    lp = flat_lp(L)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    norm = lambda x: (x / jnp.linalg.norm(x, axis=-1, keepdims=True))
    mask = jnp.ones((nv, L), jnp.float32)

    def timeit(name, fn, *xs):
        fence = lambda o: jax.device_get(
            (o[0] if isinstance(o, (tuple, list)) else o).ravel()[0])
        fence(fn(*xs))
        fence(fn(*xs))
        t0 = time.perf_counter()
        outs = [fn(*xs) for _ in range(args.iters)]
        fence(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:44s} {dt:7.2f} ms", flush=True)

    qv = norm(jax.random.normal(ks[2], (nq, D))).astype(jnp.bfloat16).T
    qs = norm(jax.random.normal(ks[3], (nq, D))).astype(jnp.bfloat16).T
    for chunk_v in (16, 32, 64):
        vf = build_flat_feat1(
            norm(jax.random.normal(ks[0], (nv, L, D))).astype(jnp.bfloat16),
            mask, chunk_v=chunk_v)
        sf = build_flat_feat1(
            norm(jax.random.normal(ks[1], (nv, L, D))).astype(jnp.bfloat16),
            mask, chunk_v=chunk_v)
        timeit(f"video_scores_pallas_flat chunk_v={chunk_v}",
               functools.partial(video_scores_pallas_flat, n_videos=nv,
                                 lp=lp, chunk_v=chunk_v), qv, qs, vf, sf)
        vf.delete(); sf.delete()

    scores = jnp.exp(20.0 * jax.random.uniform(ks[0], (nq, nv)))
    for block in (8, 16, 32):
        timeit(f"video top-k (k=100) block={block}",
               jax.jit(functools.partial(topk_stable_blocked, k=100,
                                         block=block)), scores)
    timeit("video top-k lax.top_k", jax.jit(lambda x: jax.lax.top_k(x, 100)),
           scores)


if __name__ == "__main__":
    main()

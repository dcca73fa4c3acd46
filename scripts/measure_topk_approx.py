"""Measure lax.approx_max_k vs the exact top-k selectors at bench shapes.

The round-3/4 stage profiles put ~8-10 ms of the 55 ms fused program in
three k~100-200 selection ops (video top-V, span group select, final span
top-k — lax.top_k / topk_stable_blocked). TPU has a hardware-accelerated
approximate top-k (PartialReduce, arXiv:2206.14286) exposed as
jax.lax.approx_max_k; if it wins at these shapes, an A/B-contracted
approximate selection mode is the next headline lever.

Shapes measured (bench scale: Nq=800, Nv_pad=21824, V=100, G=200, W=15):
  video top-V:        (800, 21824) k=100
  span group select:  (800, 10000) k=200
  final span top-k:   (800, 3000)  k=200

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_topk_approx.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tvretrieval_tpu.ops.span import topk_stable_blocked


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])


def time_fn(fn, *args, n_warmup=2, n_runs=10):
    for _ in range(n_warmup):
        _sync(fn(*args))
    t0 = time.time()
    for _ in range(n_runs):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n_runs * 1e3


def recall_vs_exact(fn, x, k):
    _, ai = fn(x)
    _, ei = jax.lax.top_k(x, k)
    ai, ei = np.asarray(ai), np.asarray(ei)
    return float((ai[:, :, None] == ei[:, None, :]).any(-1).mean())


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("video_topV", (800, 21824), 100, 16),
        ("span_groups", (800, 10000), 200, 8),
        ("span_final", (800, 3000), 200, 8),
    ]
    for name, shape, k, block in cases:
        x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
        exact = jax.jit(lambda s, k=k: jax.lax.top_k(s, k))
        blocked = jax.jit(lambda s, k=k, b=block: topk_stable_blocked(
            s, k, block=b))
        rows = [("lax.top_k", exact, None)]
        rows.append(("blocked", blocked, None))
        for rt in (0.90, 0.95, 0.99):
            ap = jax.jit(lambda s, k=k, rt=rt: jax.lax.approx_max_k(
                s, k, recall_target=rt))
            rows.append((f"approx rt={rt}", ap, rt))
        print(f"== {name} {shape} k={k}")
        for label, fn, rt in rows:
            ms = time_fn(fn, x)
            rec = recall_vs_exact(fn, x, k) if rt is not None else 1.0
            print(f"  {label:16s} {ms:7.2f} ms  recall={rec:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()

"""Chip timings: ops.pallas_sort.topk_transposed vs lax.top_k vs
topk_stable_blocked at the engine's selection shapes (nq=1000).

Shapes measured (the three sorts inside the span stage + video top-V):
  * group block-max select: (1000, 1250) k=200  (topk_stable_blocked pass 1)
  * blocked pool:           (1000, 1600) k=200  (topk_stable_blocked pass 2)
  * final span pool:        (1000, 3000) k=200
  * group row DIRECT:       (1000, 10000) k=200 (what the kernel could
                            replace topk_stable_blocked with entirely)
  * video block-max:        (1000, 1364) k=100  (video top-V, block=16)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_topk_transposed.py
"""
import time

import jax
import jax.numpy as jnp

from tvretrieval_tpu.ops.pallas_sort import topk_transposed
from tvretrieval_tpu.ops.span import topk_stable_blocked


def fence(x):
    jax.device_get(x[(0,) * x.ndim])


def bench(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
        fence(out[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    nq = 1000
    cases = [
        ("group_bmax (1000,1250) k=200", 1250, 200),
        ("blocked_pool (1000,1600) k=200", 1600, 200),
        ("final_pool (1000,3000) k=200", 3000, 200),
        # (1000,10000) direct: n_pad=16384 puts block+scratch+roll temps
        # past VMEM — the engine always runs the blocked prestage first
        ("video_bmax (1000,1364) k=100", 1364, 100),
    ]
    for name, n, k in cases:
        x = jax.random.uniform(jax.random.PRNGKey(n), (nq, n), jnp.float32)
        lax_fn = jax.jit(lambda a, k=k: jax.lax.top_k(a, k))
        t_lax = bench(lax_fn, x)
        t_blk = bench(lambda a: topk_stable_blocked(a, k, block=8), x)
        t_pal = bench(lambda a: topk_transposed(a, k), x)
        pv, pi = topk_transposed(x, k)
        lv, li = jax.lax.top_k(x, k)
        ok = (jnp.array_equal(pv, lv) and jnp.array_equal(pi, li))
        print(f"{name:34s} lax {t_lax:7.2f}  blocked {t_blk:7.2f}  "
              f"transposed {t_pal:7.2f} ms  bitexact={bool(ok)}", flush=True)


if __name__ == "__main__":
    main()

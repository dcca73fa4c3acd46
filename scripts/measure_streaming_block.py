"""Per-block device-time measurement for the streaming engine's phase 1.

Feeds the 1M-video deployment model (BENCH_NOTES): the streaming engine
(retrieval/streaming.py) is transfer-bound in any real deployment, so the
claim that matters is (a) the measured DEVICE time to score one streamed
block at TVR dims and (b) the host->device transfer rate, which in this
image goes through a ~40MB/s relay tunnel (documented unrepresentative of
a real PCIe v5e host at 12-24 GB/s — the model uses the PCIe roofline).

Measures, at TVR dims (lp=104, D=256, bf16 cache, Nq from argv):
  1. _block_scores_flat device time per 2048-video block (resident input,
     N back-to-back dispatches, one fence)
  2. the running top-V merge per block
  3. device_put of one block through THIS image's tunnel (for honesty)

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/measure_streaming_block.py [query_bsz=800]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

LP = 104
D = 256
BLOCK = 2048


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])


def time_stage(fn, n_warmup=2, n_runs=10):
    for _ in range(n_warmup):
        _sync(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n_runs)]
    _sync(outs[-1])
    return (time.perf_counter() - t0) / n_runs * 1e3


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    from tvretrieval_tpu.retrieval.streaming import (_block_scores_flat,
                                                     _merge_topv)

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    norm = lambda x: x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    dt = jnp.bfloat16
    vf = norm(jax.random.normal(ks[0], (BLOCK * LP, D), jnp.float32)).astype(dt)
    sf = norm(jax.random.normal(ks[1], (BLOCK * LP, D), jnp.float32)).astype(dt)
    vd = jnp.ones((BLOCK,), bool)
    qv = norm(jax.random.normal(ks[2], (nq, D), jnp.float32))
    qs = norm(jax.random.normal(ks[3], (nq, D), jnp.float32))

    t_score = time_stage(
        lambda: _block_scores_flat(qv, qs, vf, sf, vd, lp=LP))
    gb = 2 * BLOCK * LP * D * 2 / 1e9
    print(f"block score bf16 ({BLOCK} videos, Nq={nq}): {t_score:7.2f} ms "
          f"({gb:.3f} GB cache read)", flush=True)

    # int8 block variant (host blocks stored s8: half transfer + s8 MXU)
    from tvretrieval_tpu.ops.pallas_score import quantize_unit_i8
    vf8, sf8 = quantize_unit_i8(vf), quantize_unit_i8(sf)
    t_i8 = time_stage(
        lambda: _block_scores_flat(qv, qs, vf8, sf8, vd, lp=LP))
    print(f"block score int8 ({BLOCK} videos, Nq={nq}): {t_i8:7.2f} ms "
          f"({gb / 2:.3f} GB cache read)", flush=True)

    best_s = jnp.full((nq, 100), -jnp.inf, jnp.float32)
    best_i = jnp.zeros((nq, 100), jnp.int32)
    scores = _block_scores_flat(qv, qs, vf, sf, vd, lp=LP)
    t_merge = time_stage(
        lambda: _merge_topv(best_s, best_i, scores, jnp.int32(0), 100))
    print(f"top-V merge per block:                {t_merge:7.2f} ms", flush=True)

    # tunnel transfer rate for one block (this image only; real PCIe is the
    # model's roofline)
    host_block = np.asarray(vf)
    for _ in range(1):  # warmup put
        jax.device_put(host_block).block_until_ready()
    t0 = time.perf_counter()
    a = jax.device_put(host_block)
    _sync(a)
    t_put = time.perf_counter() - t0
    print(f"device_put of one stream block ({host_block.nbytes / 1e6:.0f} MB) "
          f"through this image's tunnel: {t_put * 1e3:.0f} ms "
          f"({host_block.nbytes / t_put / 1e6:.0f} MB/s)")
    host_i8 = np.asarray(vf8)
    t0 = time.perf_counter()
    a = jax.device_put(host_i8)
    _sync(a)
    t_put8 = time.perf_counter() - t0
    print(f"device_put of one INT8 block ({host_i8.nbytes / 1e6:.0f} MB): "
          f"{t_put8 * 1e3:.0f} ms ({host_i8.nbytes / t_put8 / 1e6:.0f} MB/s)")


if __name__ == "__main__":
    main()

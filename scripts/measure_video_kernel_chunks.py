"""chunk_v sweep for the int8 flat video-score kernel at bench scale.

The round-4c ledger put video_scores_pallas_flat_i8 at 55.6% int8 MFU
(8.48 ms at nq=1000) vs the bf16 kernel's 68.5% — the VPU segment-max over
the (chunk_v, lp, Nq) s32 dot output is serialized against the MXU dots,
and chunk_v sets the dot size / VMEM pressure tradeoff (at chunk_v=16,
nq=1000 the two s32 intermediates are ~13.3 MB — at the VMEM edge).
This sweeps chunk_v for both kernels to find the schedule optimum.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/measure_video_kernel_chunks.py [nq=1000]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

N_VIDEOS = int(os.environ.get("PROFILE_N_VIDEOS", 21818))
N_CLIPS = 100
HIDDEN = 256

if os.environ.get("PROFILE_CPU"):
    jax.config.update("jax_platforms", "cpu")


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])


def time_stage(fn, n_warmup=2, n_runs=10):
    for _ in range(n_warmup):
        _sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n_runs):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n_runs * 1e3


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    from tvretrieval_tpu.ops.pallas_score import (build_flat_feat1,
                                                  quantize_unit_i8,
                                                  video_scores_pallas_flat,
                                                  video_scores_pallas_flat_i8)
    interp = bool(os.environ.get("PROFILE_CPU"))
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    dt = jnp.bfloat16
    norm = lambda x: x / (jnp.linalg.norm(
        x.astype(jnp.float32), axis=-1, keepdims=True) + 1e-12).astype(x.dtype)
    mask = jnp.ones((N_VIDEOS, N_CLIPS), jnp.float32)
    vf = norm(jax.random.normal(ks[0], (N_VIDEOS, N_CLIPS, HIDDEN), dt))
    sf = norm(jax.random.normal(ks[1], (N_VIDEOS, N_CLIPS, HIDDEN), dt))
    # build the flat caches at the DEFAULT chunk pad (16); every swept
    # chunk_v must divide the padded video count, so pad once to lcm 64
    vf1 = build_flat_feat1(vf, mask, chunk_v=64)
    sf1 = build_flat_feat1(sf, mask, chunk_v=64)
    vf.delete(), sf.delete()
    vf8, sf8 = quantize_unit_i8(vf1), quantize_unit_i8(sf1)
    q = jax.random.normal(ks[2], (nq, HIDDEN), jnp.float32)
    qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    qbf = qn.astype(dt).T
    q8 = quantize_unit_i8(qn).T

    for chunk in (8, 16, 32, 64):
        try:
            fn8 = lambda: video_scores_pallas_flat_i8(
                q8, q8, vf8, sf8, n_videos=N_VIDEOS, chunk_v=chunk,
                interpret=interp)
            ms8 = time_stage(fn8)
        except Exception as e:  # noqa: BLE001 — sweep survives lowering fails
            ms8, e8 = None, str(e).splitlines()[0][:90]
        try:
            fnb = lambda: video_scores_pallas_flat(
                qbf, qbf, vf1, sf1, n_videos=N_VIDEOS, chunk_v=chunk,
                interpret=interp)
            msb = time_stage(fnb)
        except Exception as e:  # noqa: BLE001
            msb, eb = None, str(e).splitlines()[0][:90]
        print(f"chunk_v={chunk:3d}  int8 "
              f"{ms8:7.2f} ms" if ms8 is not None else
              f"chunk_v={chunk:3d}  int8   FAIL {e8}", flush=True)
        print(f"             bf16 "
              f"{msb:7.2f} ms" if msb is not None else
              f"             bf16   FAIL {eb}", flush=True)


if __name__ == "__main__":
    main()

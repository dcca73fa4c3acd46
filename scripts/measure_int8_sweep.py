"""int8 MXU study for the span similarity sweep (simsweep_cat).

BENCH_NOTES round 3 established the cat sweep is MXU-FLOP-bound, not
HBM-bound (XLA fuses the row gather; the f32 sim never fully
materializes): ~1.8 TFLOP/800 queries at K=512 sets the stage time. The
remaining lever is therefore the FLOP *rate*: v5e runs s8 x s8 -> s32 at
2x the bf16 rate (394 TOPS vs 197 TFLOPs), so an int8 feat2_cat cache
should halve the sweep floor (9.1 -> 4.5 ms) and halve its HBM besides.

Unlike feat1, feat2 rows are NOT L2-normalized, so quantization needs
scales: symmetric per-clip-row scale s_f[v, l] = max_d |feat2[v,l,d]| / 127
and per-query scale s_q[q]; the gathered s32 rows rescale by
s_q[q] * s_f[v, l] (one f32 multiply on the tiny gathered tensor).

Measures, at bench corpus scale (21,818 videos x L=100 x 2D=512,
Nq/V from argv):
  1. bf16 cat sweep + row gather (current span_score_mode="simsweep_cat")
  2. int8 cat sweep + row gather + rescale (does XLA fuse + hit s8 MXU?)
  3. quantization error of the gathered similarity vs the f32 path

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/measure_int8_sweep.py [query_bsz=400] [V=101]

Note on query_bsz: ISOLATED from the engine program, XLA materializes the
(Nq, Nv, L) sim twice (fusion output + a layout copy feeding the gather) —
at Nq=800 that is 2 x 6.5 GB f32 and the compile OOMs at 16.93/15.75 GB
HBM. Nq=400 fits; the bf16-vs-int8 RATE ratio is what the study needs and
it is Nq-independent (both paths are MXU-bound).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_VIDEOS = 21818
L = 100
DCAT = 512


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


@jax.jit
def sweep_bf16(qcat_bf16, feat2_bf16, gather_idx):
    sim = jnp.einsum("qd,nld->qnl", qcat_bf16, feat2_bf16,
                     preferred_element_type=jnp.float32)
    return jnp.take_along_axis(sim, gather_idx[:, :, None], axis=1)


@jax.jit
def sweep_int8(qcat_i8, feat2_i8, sq, sf, gather_idx):
    sim = jnp.einsum("qd,nld->qnl", qcat_i8.astype(jnp.int32),
                     feat2_i8.astype(jnp.int32),
                     preferred_element_type=jnp.int32)
    g = jnp.take_along_axis(sim, gather_idx[:, :, None], axis=1)
    sf_g = sf[gather_idx]                                  # (Nq, V, L)
    return g.astype(jnp.float32) * (sq[:, None, None] * sf_g)


@jax.jit
def sweep_f32(qcat, feat2, gather_idx):
    sim = jnp.einsum("qd,nld->qnl", qcat, feat2,
                     preferred_element_type=jnp.float32)
    return jnp.take_along_axis(sim, gather_idx[:, :, None], axis=1)


def quant_rows(x, axis):
    s = jnp.max(jnp.abs(x), axis=axis, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(s, axis)


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    v = int(sys.argv[2]) if len(sys.argv) > 2 else 101

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    feat2 = jax.random.normal(ks[0], (N_VIDEOS, L, DCAT), jnp.float32)
    qcat = jax.random.normal(ks[1], (nq, DCAT), jnp.float32) * 0.5
    gidx = jax.random.randint(ks[2], (nq, v), 0, N_VIDEOS)

    f16, q16 = feat2.astype(jnp.bfloat16), qcat.astype(jnp.bfloat16)
    f8, sf = quant_rows(feat2, axis=2)       # (Nv, L) scales
    q8, sq = quant_rows(qcat, axis=1)        # (Nq,) scales

    t = time_stage(lambda: sweep_bf16(q16, f16, gidx))
    print(f"bf16 cat sweep + gather       {t:8.2f} ms", flush=True)
    t = time_stage(lambda: sweep_int8(q8, f8, sq, sf, gidx))
    print(f"int8 cat sweep + gather       {t:8.2f} ms", flush=True)

    ref = np.asarray(sweep_f32(qcat, feat2, gidx))
    out = np.asarray(sweep_int8(q8, f8, sq, sf, gidx))
    b16 = np.asarray(sweep_bf16(q16, f16, gidx))
    scale = np.abs(ref).max()
    err = np.abs(out - ref) / scale
    err16 = np.abs(b16 - ref) / scale
    print(f"int8 sim rel err: max {err.max():.5f} mean {err.mean():.6f}")
    print(f"bf16 sim rel err: max {err16.max():.5f} mean {err16.mean():.6f}")


if __name__ == "__main__":
    main()

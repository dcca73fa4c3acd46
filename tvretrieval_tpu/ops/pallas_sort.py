"""Transposed-layout exact top-k Pallas kernel (lane-parallel bitonic sort).

Replaces ``jax.lax.top_k`` at the retrieval engine's three selection sites
(reference host sort: inference.py:252-262 video ranking, inference.py:378-386
span selection; XLA path: ops/span.py topk_stable_blocked + the final pool
top_k). XLA's TopK on TPU sorts ALONG THE LANE AXIS, so every
compare-exchange moves data across lanes — the expensive direction. This
kernel transposes the problem: data lives (n, nq) with each of 128 LANES
holding an independent query's row down the SUBLANE axis, so every bitonic
partner exchange is a sublane roll (cheap VPU data movement) and all 128
queries sort in lockstep. Measured on v5e at the engine's three shapes
(see BENCH_NOTES round 5): the three lax.top_k/blocked selections cost
~12 ms at nq=1000; this kernel runs the same selections bit-exactly in a
fraction (numbers in BENCH_NOTES).

Exactness: compound comparisons (value desc, index asc) reproduce
``lax.top_k``'s stable tie order bit-for-bit; values are compared as the
same f32s XLA compares. Pinned by tests/test_pallas_sort.py (interpret
mode on CPU + the differential engine tests on TPU).

Mosaic notes (CLAUDE.md gotchas honored):
  * mask algebra in int32 (vector i1 and/or fails to lower);
  * ``pltpu.roll`` shifts are non-negative and the data is f32/i32;
  * block last-two dims are (multiple of 8, 128);
  * the sort network is statically unrolled (static shapes, no dynamic
    control flow).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
_LANES = 128


def _compound_gt(v, i, pv, pi):
    """int32 {0,1}: (v, i) beats (pv, pi) in (value desc, index asc) order.

    Int32 boolean algebra — Mosaic cannot lower the i1 vectors that
    and/or on packed bools produce (same trick as ops/pallas_topk.py).
    """
    gt = jnp.where(v > pv, 1, 0)
    eq = jnp.where(v == pv, 1, 0)
    lt = jnp.where(i < pi, 1, 0)
    return gt + eq * lt


def _stage(v, i, p, j: int, kblk: int):
    """One bitonic compare-exchange pass at stride j, block size kblk, over
    (n, 128) (value, index) arrays; the sort key order is (value desc,
    index asc) in ascending-position blocks. p is the sublane-index iota.

    Partners are p XOR j: for elements with bit j clear that is p + j
    (reached by rolling the array UP by j => roll shift n - j), for
    elements with bit j set it is p - j (roll DOWN by j => shift j).
    Pure sublane rolls — no lane crossing anywhere.
    """
    n = v.shape[0]
    pv_f = pltpu.roll(v, n - j, axis=0)   # partner value for bit-j == 0
    pi_f = pltpu.roll(i, n - j, axis=0)
    pv_b = pltpu.roll(v, j, axis=0)       # partner value for bit-j == 1
    pi_b = pltpu.roll(i, j, axis=0)
    bj = (p >> (j.bit_length() - 1)) & 1          # 1 => high element of pair
    bk = (p >> (kblk.bit_length() - 1)) & 1       # 1 => reversed block
    pv = jnp.where(bj == 0, pv_f, pv_b)
    pi = jnp.where(bj == 0, pi_f, pi_b)
    # In a "forward" block (bk == 0) position order is (value desc, index
    # asc): the LOW element of a pair keeps the winner. take == 1 => swap.
    eff = _compound_gt(pv, pi, v, i)              # partner beats mine
    want_partner_low = eff                        # low position wants winner
    take = jnp.where(bj == 0, want_partner_low, 1 - want_partner_low)
    take = jnp.where(bk == 0, take, 1 - take)
    return (jnp.where(take == 1, pv, v), jnp.where(take == 1, pi, i))


def _sort_desc(v, i, p, n: int):
    """Full bitonic sort of (n, 128) columns, (value desc, index asc)."""
    kblk = 2
    while kblk <= n:
        j = kblk // 2
        while j >= 1:
            v, i = _stage(v, i, p, j, kblk)
            j //= 2
        kblk *= 2
    return v, i


def _make_kernel(n: int, k_pad: int):
    def kernel(x_ref, out_v_ref, out_i_ref):
        p = jax.lax.broadcasted_iota(jnp.int32, (n, _LANES), 0)
        v = x_ref[:]
        v, i = _sort_desc(v, p, p, n)
        out_v_ref[:] = v[:k_pad]
        out_i_ref[:] = i[:k_pad]
    return kernel


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def topk_transposed(x: jnp.ndarray, k: int, interpret: bool = False):
    """Exact stable top-k along the last axis via the lane-parallel kernel.

    Drop-in for ``jax.lax.top_k(x, k)`` (bit-equal values AND indices,
    including the stable ascending-index tie order) for 2-D f32 ``x`` of
    finite values. Internally pads rows to the next power of two with
    -inf (never selected while the row has >= k finite values — the same
    contract as ops/span.topk_stable_blocked) and queries to a lane
    multiple, transposes to (n_pad, nq_pad), sorts every lane column with
    a statically-unrolled bitonic network of SUBLANE rolls, and returns
    the top ``k`` rows transposed back.
    """
    nq, n = x.shape
    if n <= k:
        return jax.lax.top_k(x, min(k, n))
    n_pad = 1 << (n - 1).bit_length()
    nq_pad = _ceil_to(nq, _LANES)
    k_pad = _ceil_to(k, 8)
    xt = jnp.full((n_pad, nq_pad), NEG_INF, jnp.float32)
    xt = jax.lax.dynamic_update_slice(xt, x.astype(jnp.float32).T, (0, 0))
    grid = (nq_pad // _LANES,)
    out_v, out_i = pl.pallas_call(
        _make_kernel(n_pad, k_pad),
        grid=grid,
        in_specs=[pl.BlockSpec((n_pad, _LANES), lambda g: (0, g),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((k_pad, _LANES), lambda g: (0, g),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((k_pad, _LANES), lambda g: (0, g),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((k_pad, nq_pad), jnp.float32),
                   jax.ShapeDtypeStruct((k_pad, nq_pad), jnp.int32)],
        interpret=interpret,
    )(xt)
    vals = out_v[:k, :nq].T
    idx = out_i[:k, :nq].T
    # pad rows carry index >= n; a finite row never selects them (callers
    # guarantee >= k finite values); clamp like topk_stable_blocked so a
    # NaN-poisoned input cannot crash metadata indexing downstream
    return vals, jnp.minimum(idx, n - 1)

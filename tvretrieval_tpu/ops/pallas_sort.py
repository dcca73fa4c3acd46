"""Transposed-layout exact top-k Pallas kernel (lane-parallel bitonic sort).

Replaces ``jax.lax.top_k`` at the retrieval engine's three selection sites
(reference host sort: inference.py:252-262 video ranking, inference.py:378-386
span selection; XLA path: ops/span.py topk_stable_blocked + the final pool
top_k). XLA's TopK on TPU sorts ALONG THE LANE AXIS, so every
compare-exchange moves data across lanes — the expensive direction. This
kernel transposes the problem: data lives (n, nq) with each of 128 LANES
holding an independent query's row down the SUBLANE axis, so every bitonic
partner exchange is a sublane roll (cheap VPU data movement) and all 128
queries sort in lockstep.

Measured on v5e (BENCH_NOTES round 5): standalone the kernel beats
lax.top_k at some engine shapes ((1000,1250) k=200: 3.33 vs 4.01 ms) and
ties/loses at others (lax's own timings swing 3.2-6.1 ms run to run);
ENGINE-LEVEL the psort modes are a measured NEGATIVE (-6.7%: 56.18 vs
52.66 ms/batch at corpus scale) — the pad-to-pow2 + transpose layout
copies cost more inside the fused program than the sort saves, while XLA
fuses lax.top_k's surroundings. The modes stay as validated, bit-exact
infrastructure (same status as grouped_shift8): they would win where rows
are long, k/n is small, and the input is already transposed.

Exactness: compound comparisons (value desc, index asc) reproduce
``lax.top_k``'s stable tie order bit-for-bit; values are compared as the
same f32s XLA compares. Pinned by tests/test_pallas_sort.py (interpret
mode on CPU + the differential engine tests on TPU).

Compile-size note: a fully unrolled network is Σ log2(n) stages and each
stage's IR is proportional to n/8 sublane tiles — at n=2048 (66 stages x
256 tiles) Mosaic compile blew past 15 minutes / crashed the remote
compile helper. Instead the kernel keeps ONE stage body per distinct roll
stride (log2(n) bodies, selected by ``lax.switch``) and drives the
(kblk, j) schedule with traced ``fori_loop`` counters; the block-size
mask uses a traced right-shift, so only the roll stride is static.

Mosaic notes (CLAUDE.md gotchas honored):
  * mask algebra in int32 (vector i1 and/or fails to lower);
  * ``pltpu.roll`` shifts are non-negative and the data is f32/i32;
  * block last-two dims are (multiple of 8, 128);
  * dynamically-indexed control state is scalar (loop counters), all
    array shapes static.
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


def _stage(v, i, p, j: int, kblk_log):
    """One bitonic compare-exchange pass at STATIC stride j; the block
    size 2**kblk_log is TRACED (mask via right-shift), over (n, 128)
    (value, index) arrays; p is the sublane-index iota. The key order is
    (value desc, index asc) in forward blocks.

    Partners are p XOR j: for elements with bit j clear that is p + j
    (roll shift n - j), for elements with bit j set it is p - j (roll
    shift j). Pure sublane rolls — no lane crossing anywhere.
    """
    n = v.shape[0]
    pv_f = pltpu.roll(v, n - j, axis=0)   # partner value for bit-j == 0
    pi_f = pltpu.roll(i, n - j, axis=0)
    pv_b = pltpu.roll(v, j, axis=0)       # partner value for bit-j == 1
    pi_b = pltpu.roll(i, j, axis=0)
    bj = (p >> (j.bit_length() - 1)) & 1          # 1 => high element of pair
    bk = jax.lax.shift_right_logical(
        p, jnp.broadcast_to(kblk_log, p.shape)) & 1   # 1 => reversed block
    pv = jnp.where(bj == 0, pv_f, pv_b)
    pi = jnp.where(bj == 0, pi_f, pi_b)
    # In a "forward" block (bk == 0) position order is (value desc, index
    # asc): the LOW element of a pair keeps the winner. take == 1 => swap.
    eff = _compound_gt(pv, pi, v, i)              # partner beats mine
    take = jnp.where(bj == 0, eff, 1 - eff)
    take = jnp.where(bk == 0, take, 1 - take)
    return (jnp.where(take == 1, pv, v), jnp.where(take == 1, pi, i))


def _make_kernel(n: int, k_pad: int):
    log2n = n.bit_length() - 1
    # truncating top-k: fully sort only blocks of B = next_pow2(k_pad),
    # then log2(n/B) merge-and-discard rounds (each keeps the top half) —
    # ~1.7x fewer row-stage units than the full n sort at the engine's
    # n/k ratios, and later rounds touch geometrically less data
    B = max(8, 1 << (k_pad - 1).bit_length())
    log2B = min(B, n).bit_length() - 1

    def kernel(x_ref, out_v_ref, out_i_ref, v_ref, i_ref):
        p = jax.lax.broadcasted_iota(jnp.int32, (n, _LANES), 0)
        v_ref[:] = x_ref[:]
        i_ref[:] = p

        # --- phase 1: standard bitonic network up to block size B — each
        # B-block ends sorted with ALTERNATING direction (desc/asc by
        # block parity), the valley structure phase 2's merges need.
        # One switch branch per distinct roll stride 2**b: IR holds
        # log2(B) stage bodies instead of the full unrolled network
        # (66 stages x n/8 sublane tiles blew Mosaic compile at n=2048).
        def make_branch(b):
            def branch(kblk_log):
                v, i = _stage(v_ref[:], i_ref[:], p, 1 << b, kblk_log)
                v_ref[:] = v
                i_ref[:] = i
            return branch

        branches = [make_branch(b) for b in range(log2B)]

        # phases kblk = 2**m, m = 1..log2B; phase m runs strides
        # j = 2**(m-1) ... 2**0 (jpow = m-1-s)
        def phase(m, _):
            def stage_step(s, __):
                jax.lax.switch(m - 1 - s, branches, m)
                return __
            return jax.lax.fori_loop(0, m, stage_step, _)

        jax.lax.fori_loop(1, log2B + 1, phase, None)

        # --- phase 2: merge pairs [desc-block ; asc-block], keep the top
        # half, re-sort kept blocks into alternating direction; height
        # halves per round (static python loop — shapes shrink per round)
        h = n
        while h > B:
            ph = p[:h]
            # forward compare-exchange at stride B for EVERY pair
            # (kblk_log > log2(n) => direction bit 0 everywhere): the low
            # half of each 2B pair now holds that pair's top-B elements
            # (bitonic valley property), as a bitonic sequence
            v, i = _stage(v_ref[:h], i_ref[:h], ph, B, log2n + 2)
            keep = lambda a: a.reshape(h // (2 * B), 2 * B, _LANES)[:, :B, :
                                       ].reshape(h // 2, _LANES)
            v_ref[: h // 2] = keep(v)
            i_ref[: h // 2] = keep(i)
            h //= 2
            # bitonic merge of each kept B-block, direction = block parity
            # (bit log2(B) of position) — rebuilds the alternating valley
            j = B // 2
            while j >= 1:
                v, i = _stage(v_ref[:h], i_ref[:h], p[:h], j, log2B)
                v_ref[:h] = v
                i_ref[:h] = i
                j //= 2

        out_v_ref[:] = v_ref[:k_pad]
        out_i_ref[:] = i_ref[:k_pad]

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
    a bitonic network of SUBLANE rolls, and returns the top ``k`` rows
    transposed back.
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
        scratch_shapes=[pltpu.VMEM((n_pad, _LANES), jnp.float32),
                        pltpu.VMEM((n_pad, _LANES), jnp.int32)],
        # n_pad=4096: block + scratch + one stage's four roll temps peak at
        # ~20M scoped vmem; v5e has headroom above the 16M default limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xt)
    vals = out_v[:k, :nq].T
    idx = out_i[:k, :nq].T
    # pad rows carry index >= n; a finite row never selects them (callers
    # guarantee >= k finite values); clamp like topk_stable_blocked so a
    # NaN-poisoned input cannot crash metadata indexing downstream
    return vals, jnp.minimum(idx, n - 1)

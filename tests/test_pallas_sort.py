"""Bit-equality of ops.pallas_sort.topk_transposed vs jax.lax.top_k.

Interpret mode on CPU (Mosaic does not lower on the CPU backend); the
same kernel is exercised compiled on TPU by the engine differentials and
scripts/measure_topk_transposed.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvretrieval_tpu.ops.pallas_sort import topk_transposed


@pytest.mark.parametrize("nq,n,k", [
    (7, 1250, 200),      # span group-select shape class (non-pow2 n, ragged nq)
    (128, 1600, 200),    # blocked pool shape
    (130, 3000, 200),    # final span pool shape (crosses a lane tile)
    (16, 300, 100),      # small
    (3, 257, 256),       # k barely below n
])
def test_matches_lax_topk_bitexact(nq, n, k):
    key = jax.random.PRNGKey(nq * 1000 + n)
    x = jax.random.normal(key, (nq, n), jnp.float32)
    want_v, want_i = jax.lax.top_k(x, k)
    got_v, got_i = topk_transposed(x, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_stable_tie_order():
    # heavy ties: quantized values force index tie-breaks everywhere
    key = jax.random.PRNGKey(0)
    x = jnp.round(jax.random.uniform(key, (9, 1024)) * 8) / 8.0
    want_v, want_i = jax.lax.top_k(x, 200)
    got_v, got_i = topk_transposed(x, 200, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_nonnegative_scores_with_zeros():
    # span-score-like inputs: many exact zeros (invalid band ends)
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (5, 3000)) * (
        jax.random.uniform(jax.random.PRNGKey(2), (5, 3000)) > 0.7)
    want_v, want_i = jax.lax.top_k(x, 200)
    got_v, got_i = topk_transposed(x, 200, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_n_not_above_k_falls_back():
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 150), jnp.float32)
    want_v, want_i = jax.lax.top_k(x, 150)
    got_v, got_i = topk_transposed(x, 200, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


@pytest.mark.parametrize("nq,V,L,min_l,max_l,top_n,kw", [
    (3, 9, 20, 1, 7, 50, {}),
    (2, 7, 16, 1, 5, 100, {"flat_ties": True}),
    (2, 6, 20, 1, 9, 64, {"masked_tail": 8}),
])
def test_grouped_shift_psort_matches_flat(nq, V, L, min_l, max_l, top_n, kw):
    from tests.test_pallas_topk import _case
    from tvretrieval_tpu.ops.span import (banded_topk_spans,
                                          banded_topk_spans_grouped_shift_psort)
    st, ed, vs = _case(nq, V, L, seed=nq * 19 + V, **kw)
    ref = banded_topk_spans(st, ed, vs, min_l, max_l, top_n)
    got = banded_topk_spans_grouped_shift_psort(st, ed, vs, min_l, max_l,
                                                top_n, interpret=True)
    for name, r, g in zip(("vid", "st", "ed", "scores"), ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg=name)


def test_grouped_shift_psort_keep_mask():
    from tests.test_pallas_topk import _case
    from tvretrieval_tpu.ops.span import (banded_topk_spans,
                                          banded_topk_spans_grouped_shift_psort)
    nq, V, L, min_l, max_l, top_n = 2, 5, 33, 2, 16, 200
    st, ed, vs = _case(nq, V, L, seed=71)
    rng = np.random.default_rng(5)
    keep = jnp.asarray((rng.random((nq, V)) > 0.4).astype(np.float32))
    ref = banded_topk_spans(st, ed, vs, min_l, max_l, top_n, keep_mask=keep)
    got = banded_topk_spans_grouped_shift_psort(
        st, ed, vs, min_l, max_l, top_n, keep_mask=keep, interpret=True)
    for name, r, g in zip(("vid", "st", "ed", "scores"), ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg=name)


def test_topk_stable_blocked_psort_matches_lax():
    from tvretrieval_tpu.ops.span import topk_stable_blocked_psort
    x = jax.random.uniform(jax.random.PRNGKey(9), (5, 1000), jnp.float32)
    x = jnp.round(x * 64) / 64  # force ties across blocks
    want_v, want_i = jax.lax.top_k(x, 200)
    got_v, got_i = topk_stable_blocked_psort(x, 200, block=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))

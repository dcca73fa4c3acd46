"""The fused Pallas banded top-k must match the XLA path bit-for-bit,
including stable tie order (zeros from masked positions / invalid band
ends) and padding semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvretrieval_tpu.ops.pallas_topk import banded_topk_spans_pallas
from tvretrieval_tpu.ops.span import banded_topk_spans


def _case(nq, V, L, seed, masked_tail=0, flat_ties=False):
    rng = np.random.default_rng(seed)
    st = rng.random((nq, V, L)).astype(np.float32)
    ed = rng.random((nq, V, L)).astype(np.float32)
    if masked_tail:
        # emulate softmax-underflow zeros at masked clip positions
        st[..., L - masked_tail:] = 0.0
        ed[..., L - masked_tail:] = 0.0
    if flat_ties:
        # heavy exact ties: quantize probabilities to a few levels
        st = np.round(st * 2) / 2
        ed = np.round(ed * 2) / 2
    vs = np.exp(4.0 * rng.random((nq, V))).astype(np.float32)
    vs = -np.sort(-vs, axis=1)  # engine order: descending video score
    return jnp.asarray(st), jnp.asarray(ed), jnp.asarray(vs)


@pytest.mark.parametrize("nq,V,L,min_l,max_l,top_n,kw", [
    (3, 9, 20, 1, 7, 50, {}),
    (2, 5, 33, 2, 16, 200, {}),
    (2, 6, 20, 1, 9, 64, {"masked_tail": 8}),
    (2, 7, 16, 1, 5, 100, {"flat_ties": True}),
    (1, 3, 10, 2, 6, 120, {}),       # top_n exceeds the positive span count
    (2, 4, 128, 2, 18, 256, {}),     # full 128-lane width, W=16
])
def test_pallas_matches_xla_exactly(nq, V, L, min_l, max_l, top_n, kw):
    st, ed, vs = _case(nq, V, L, seed=nq * 100 + V, **kw)
    ref = banded_topk_spans(st, ed, vs, min_l, max_l, top_n)
    got = banded_topk_spans_pallas(st, ed, vs, min_l, max_l, top_n,
                                   interpret=True)
    names = ("vid", "st", "ed", "scores")
    for name, r, g in zip(names, ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg=name)


@pytest.mark.parametrize("nq,V,L,min_l,max_l,top_n,kw", [
    (3, 9, 20, 1, 7, 50, {}),
    (2, 5, 33, 2, 16, 200, {}),
    (2, 6, 20, 1, 9, 64, {"masked_tail": 8}),
    (2, 7, 16, 1, 5, 100, {"flat_ties": True}),
    (1, 3, 10, 2, 6, 120, {}),       # top_n exceeds the positive span count
    (2, 4, 128, 2, 18, 256, {}),
    (4, 12, 24, 1, 24, 37, {}),      # W == L (window covers whole axis)
])
def test_grouped_matches_flat_exactly(nq, V, L, min_l, max_l, top_n, kw):
    from tvretrieval_tpu.ops.span import (banded_topk_spans_grouped,
                                          banded_topk_spans_grouped_shift)
    st, ed, vs = _case(nq, V, L, seed=nq * 37 + V, **kw)
    ref = banded_topk_spans(st, ed, vs, min_l, max_l, top_n)
    got = banded_topk_spans_grouped(st, ed, vs, min_l, max_l, top_n)
    for name, r, g in zip(("vid", "st", "ed", "scores"), ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg=name)
    # shift-reduction expansion variant: same bit-for-bit contract
    got_s = banded_topk_spans_grouped_shift(st, ed, vs, min_l, max_l, top_n)
    for name, r, g in zip(("vid", "st", "ed", "scores"), ref, got_s):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg="shift " + name)
    # aligned-8-block gather expansion variant: same bit-for-bit contract
    from tvretrieval_tpu.ops.span import banded_topk_spans_grouped_shift8
    got_8 = banded_topk_spans_grouped_shift8(st, ed, vs, min_l, max_l, top_n)
    for name, r, g in zip(("vid", "st", "ed", "scores"), ref, got_8):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg="shift8 " + name)


@pytest.mark.parametrize("nq,V,L,min_l,max_l,top_n", [
    (3, 9, 20, 1, 7, 50),
    (2, 5, 33, 2, 16, 200),
    (2, 7, 16, 1, 5, 100),
])
def test_grouped_variants_keep_mask_exact(nq, V, L, min_l, max_l, top_n):
    """The keep_mask transform (sharded engine: exclude videos outside the
    exact global top-V) must be bit-equal across the flat, shift, and
    shift8 expansions."""
    from tvretrieval_tpu.ops.span import (banded_topk_spans_grouped_shift,
                                          banded_topk_spans_grouped_shift8)
    st, ed, vs = _case(nq, V, L, seed=nq * 53 + V)
    rng = np.random.default_rng(nq + V)
    keep = jnp.asarray((rng.random((nq, V)) > 0.4).astype(np.float32))
    ref = banded_topk_spans(st, ed, vs, min_l, max_l, top_n, keep_mask=keep)
    for fn, tag in ((banded_topk_spans_grouped_shift, "shift"),
                    (banded_topk_spans_grouped_shift8, "shift8")):
        got = fn(st, ed, vs, min_l, max_l, top_n, keep_mask=keep)
        for name, r, g in zip(("vid", "st", "ed", "scores"), ref, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                          err_msg=f"{tag} {name}")


@pytest.mark.parametrize("n,k,block,mode", [
    (21818, 100, 32, "random"),
    (1000, 100, 32, "random"),
    (500, 100, 32, "ties"),      # heavy exact ties incl. zeros
    (130, 100, 32, "random"),    # k close to n
    (64, 100, 32, "random"),     # n <= k fallback
])
def test_topk_stable_blocked_matches_lax(n, k, block, mode):
    from tvretrieval_tpu.ops.span import topk_stable_blocked
    rng = np.random.default_rng(n + k)
    x = rng.random((7, n)).astype(np.float32)
    if mode == "ties":
        x = np.round(x * 4) / 4
        x[:, ::3] = 0.0
    x = jnp.asarray(x)
    rv, ri = jax.lax.top_k(x, min(k, n))
    gv, gi = topk_stable_blocked(x, k, block=block)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv))


def test_kernel_limit_guard():
    st, ed, vs = _case(1, 2, 12, seed=0)
    with pytest.raises(ValueError):
        banded_topk_spans_pallas(st, ed, vs, 1, 18 + 1, 50, interpret=True)

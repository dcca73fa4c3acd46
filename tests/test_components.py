"""Unit tests for shared blocks and span ops."""
import jax
import jax.numpy as jnp
import numpy as np

from tvretrieval_tpu.models.components import (
    BertAttention, BertSelfAttention, Conv1dSame, LinearLayer,
    TrainablePositionalEncoding, sinusoidal_position_encoding,
)
from tvretrieval_tpu.ops.masking import mask_logits
from tvretrieval_tpu.ops.span import min_max_length_mask, top_spans_from_probs, flat_topk_spans


def test_mask_logits():
    x = jnp.array([[1.0, 2.0, 3.0]])
    m = jnp.array([[1.0, 1.0, 0.0]])
    out = mask_logits(x, m)
    assert out[0, 0] == 1.0 and out[0, 2] == -1e10


def test_attention_mask_blocks_padded_keys(rng):
    """Attention output must not depend on values at masked key positions."""
    att = BertSelfAttention(num_heads=4, dropout=0.0)
    x = jnp.asarray(rng.normal(size=(2, 10, 32)), dtype=jnp.float32)
    mask = jnp.ones((2, 10)).at[:, 7:].set(0.0)
    params = att.init(jax.random.PRNGKey(0), x, x, x, mask)
    out1 = att.apply(params, x, x, x, mask)
    x2 = x.at[:, 7:].set(99.0)  # perturb masked positions
    out2 = att.apply(params, x2, x2, x2, mask)
    np.testing.assert_allclose(np.asarray(out1[:, :7]), np.asarray(out2[:, :7]),
                               rtol=2e-4, atol=2e-5)


def test_conv1d_same_matches_manual_correlation(rng):
    conv = Conv1dSame(kernel_size=5)
    x = jnp.asarray(rng.normal(size=(3, 20)), dtype=jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), x)
    out = conv.apply(params, x)
    kernel = np.asarray(params["params"]["conv"]["kernel"])[:, 0, 0]  # (5,)
    xp = np.pad(np.asarray(x), ((0, 0), (2, 2)))
    expect = np.stack([
        np.convolve(xp[i], kernel[::-1], mode="valid") for i in range(3)])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_conv1d_same_batched_rows(rng):
    """(Nq, Nv, L) rows must convolve identically to flattened (Nq*Nv, L)."""
    conv = Conv1dSame(kernel_size=5)
    x = jnp.asarray(rng.normal(size=(2, 3, 16)), dtype=jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), x)
    out3d = conv.apply(params, x)
    out2d = conv.apply(params, x.reshape(6, 16)).reshape(2, 3, 16)
    np.testing.assert_allclose(np.asarray(out3d), np.asarray(out2d), rtol=1e-6)


def test_min_max_length_mask_matches_reference_semantics():
    # reference inference.py:170-192 docstring case: L=4, min_l=1, max_l=3
    m = min_max_length_mask(4, 1, 3)
    expect = np.array([
        [0, 1, 1, 0],
        [0, 0, 1, 1],
        [0, 0, 0, 1],
        [0, 0, 0, 0]], dtype=np.float32)
    np.testing.assert_array_equal(m, expect)


def test_top_spans_from_probs_agrees_with_numpy(rng):
    st = jnp.asarray(rng.uniform(size=(4, 12)), dtype=jnp.float32)
    ed = jnp.asarray(rng.uniform(size=(4, 12)), dtype=jnp.float32)
    lm = jnp.asarray(min_max_length_mask(12, 2, 8))
    st_i, ed_i, scores = top_spans_from_probs(st, ed, lm, top_n=5)
    joint = np.einsum("bm,bn->bmn", np.asarray(st), np.asarray(ed)) * np.asarray(lm)
    for b in range(4):
        flat = joint[b].ravel()
        best = np.sort(flat)[::-1][:5]
        np.testing.assert_allclose(np.asarray(scores[b]), best, rtol=1e-5)
        np.testing.assert_allclose(
            joint[b][np.asarray(st_i[b]), np.asarray(ed_i[b])], best, rtol=1e-5)


def test_flat_topk_spans_unravels_correctly(rng):
    joint = jnp.asarray(rng.uniform(size=(2, 3, 6, 6)), dtype=jnp.float32)
    vid, st, ed, scores = flat_topk_spans(joint, top_n=4)
    jnp_ = np.asarray(joint)
    for q in range(2):
        flat = jnp_[q].ravel()
        best = np.sort(flat)[::-1][:4]
        np.testing.assert_allclose(np.asarray(scores[q]), best, rtol=1e-6)
        got = jnp_[q][np.asarray(vid[q]), np.asarray(st[q]), np.asarray(ed[q])]
        np.testing.assert_allclose(got, best, rtol=1e-6)


def test_chunked_masked_max_matches_einsum(rng):
    from tvretrieval_tpu.ops.span import chunked_masked_max_scores
    M, Nv, L, D = 5, 19, 8, 16  # Nv not a multiple of block -> padded tail
    q = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(Nv, L, D)), jnp.float32)
    mask = np.ones((Nv, L), np.float32)
    mask[2, 5:] = 0.0
    mask[-1] = 0.0
    mask = jnp.asarray(mask)
    ours = chunked_masked_max_scores(q, f, mask, block=8)
    sims = np.einsum("md,nld->mnl", np.asarray(q), np.asarray(f))
    m = np.asarray(mask)[None]
    ref = (sims * m + (1 - m) * -1e10).max(axis=2)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-4)


def test_banded_topk_matches_dense(rng):
    from tvretrieval_tpu.ops.span import banded_topk_spans, banded_top_spans_from_probs
    nq, v, L, min_l, max_l, topn = 3, 5, 20, 2, 9, 25
    st = jnp.asarray(rng.uniform(size=(nq, v, L)), jnp.float32)
    ed = jnp.asarray(rng.uniform(size=(nq, v, L)), jnp.float32)
    vs = jnp.asarray(rng.uniform(1, 2, size=(nq, v)), jnp.float32)
    lm = jnp.asarray(min_max_length_mask(L, min_l, max_l))

    joint = (st[:, :, :, None] * ed[:, :, None, :]
             * vs[:, :, None, None] * lm[None, None])
    d_vid, d_st, d_ed, d_scores = flat_topk_spans(joint, topn)
    b_vid, b_st, b_ed, b_scores = banded_topk_spans(st, ed, vs, min_l, max_l, topn)
    np.testing.assert_allclose(np.asarray(b_scores), np.asarray(d_scores), rtol=1e-6)
    for q in range(nq):
        dense_set = set(zip(np.asarray(d_vid)[q].tolist(),
                            np.asarray(d_st)[q].tolist(),
                            np.asarray(d_ed)[q].tolist()))
        band_set = set(zip(np.asarray(b_vid)[q].tolist(),
                           np.asarray(b_st)[q].tolist(),
                           np.asarray(b_ed)[q].tolist()))
        assert dense_set == band_set

    # two-stage variant equals single-stage (same scores, same span sets)
    from tvretrieval_tpu.ops.span import banded_topk_spans_two_stage
    t_vid, t_st, t_ed, t_scores = banded_topk_spans_two_stage(
        st, ed, vs, min_l, max_l, topn)
    np.testing.assert_allclose(np.asarray(t_scores), np.asarray(d_scores), rtol=1e-6)
    for q in range(nq):
        dense_set = set(zip(np.asarray(d_vid)[q].tolist(),
                            np.asarray(d_st)[q].tolist(),
                            np.asarray(d_ed)[q].tolist()))
        ts_set = set(zip(np.asarray(t_vid)[q].tolist(),
                         np.asarray(t_st)[q].tolist(),
                         np.asarray(t_ed)[q].tolist()))
        assert dense_set == ts_set

    # single-video variant vs dense top_spans_from_probs
    st1 = jnp.asarray(rng.uniform(size=(4, L)), jnp.float32)
    ed1 = jnp.asarray(rng.uniform(size=(4, L)), jnp.float32)
    ds, de, dsc = top_spans_from_probs(st1, ed1, lm, topn)
    bs, be, bsc = banded_top_spans_from_probs(st1, ed1, min_l, max_l, topn)
    np.testing.assert_allclose(np.asarray(bsc), np.asarray(dsc), rtol=1e-6)
    for q in range(4):
        assert (set(zip(np.asarray(ds)[q].tolist(), np.asarray(de)[q].tolist()))
                == set(zip(np.asarray(bs)[q].tolist(), np.asarray(be)[q].tolist())))


def test_sinusoidal_pe_shape():
    pe = sinusoidal_position_encoding(50, 64)
    assert pe.shape == (50, 64)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-6)  # sin(0)=0


def test_linear_layer_and_pos_embed_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 7, 16)), dtype=jnp.float32)
    ll = LinearLayer(out_dim=8)
    params = ll.init(jax.random.PRNGKey(0), x)
    assert ll.apply(params, x).shape == (2, 7, 8)
    pe = TrainablePositionalEncoding(max_len=10)
    p2 = pe.init(jax.random.PRNGKey(0), x)
    assert pe.apply(p2, x).shape == x.shape

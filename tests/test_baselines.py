"""Baseline model tests: RNN parity vs torch, ExCL/MEE/CAL forwards,
proposal generator parity vs the reference implementation."""
import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ---------------------------------------------------------------------------
# RNNEncoder: differential parity vs torch bidirectional LSTM w/ packing
# ---------------------------------------------------------------------------

def _copy_torch_lstm_to_flax(tlstm, params, direction=""):
    """Map torch LSTM (gate order i,f,g,o) into flax OptimizedLSTMCell."""
    sfx = "_reverse" if direction == "bwd" else ""
    W_ih = getattr(tlstm, f"weight_ih_l0{sfx}").detach().numpy()  # (4H, D)
    W_hh = getattr(tlstm, f"weight_hh_l0{sfx}").detach().numpy()  # (4H, H)
    b = (getattr(tlstm, f"bias_ih_l0{sfx}").detach().numpy()
         + getattr(tlstm, f"bias_hh_l0{sfx}").detach().numpy())   # (4H,)
    H = W_hh.shape[1]
    gates = {"i": 0, "f": 1, "g": 2, "o": 3}
    cell = params[f"{direction}_cell"]
    for g, k in gates.items():
        cell[f"i{g}"]["kernel"] = jnp.asarray(W_ih[k * H:(k + 1) * H].T)
        cell[f"h{g}"]["kernel"] = jnp.asarray(W_hh[k * H:(k + 1) * H].T)
        cell[f"h{g}"]["bias"] = jnp.asarray(b[k * H:(k + 1) * H])


def test_rnn_encoder_matches_torch_packed_lstm(rng):
    torch = pytest.importorskip("torch")
    import flax
    from tvretrieval_tpu.models.rnn import RNNEncoder

    N, L, D, H = 4, 9, 6, 5
    x = rng.normal(size=(N, L, D)).astype(np.float32)
    lengths = np.array([9, 5, 7, 2], dtype=np.int32)

    enc = RNNEncoder(hidden_size=H, rnn_type="lstm", bidirectional=True)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lengths))
    p = flax.core.unfreeze(variables)["params"]

    tlstm = torch.nn.LSTM(D, H, 1, batch_first=True, bidirectional=True)
    _copy_torch_lstm_to_flax(tlstm, p, "fwd")
    _copy_torch_lstm_to_flax(tlstm, p, "bwd")

    out, hidden = enc.apply({"params": p}, jnp.asarray(x), jnp.asarray(lengths))

    from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence
    tx = torch.from_numpy(x)
    order = np.argsort(-lengths)
    packed = pack_padded_sequence(tx[order], lengths[order].tolist(), batch_first=True)
    tout_p, (th, tc) = tlstm(packed)
    tout, _ = pad_packed_sequence(tout_p, batch_first=True, total_length=L)
    inv = np.argsort(order)
    tout = tout[inv].detach().numpy()
    th = th.transpose(0, 1)[inv].reshape(N, -1).detach().numpy()  # (N, 2H)

    np.testing.assert_allclose(np.asarray(out), tout, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hidden), th, rtol=1e-4, atol=1e-5)


def test_rnn_outputs_zero_beyond_length(rng):
    from tvretrieval_tpu.models.rnn import RNNEncoder
    enc = RNNEncoder(hidden_size=4, rnn_type="gru")
    x = jnp.asarray(rng.normal(size=(2, 6, 3)), dtype=jnp.float32)
    lengths = jnp.asarray([3, 6])
    variables = enc.init(jax.random.PRNGKey(0), x, lengths)
    out, _ = enc.apply(variables, x, lengths)
    assert float(jnp.abs(out[0, 3:]).max()) == 0.0


# ---------------------------------------------------------------------------
# ExCL
# ---------------------------------------------------------------------------

def test_excl_forward_and_grad(rng):
    from tvretrieval_tpu.models.excl import ExCL, ExCLConfig
    cfg = ExCLConfig(ctx_mode="video_sub", visual_input_size=12,
                     sub_input_size=10, query_input_size=8, hidden_size=16)
    model = ExCL(cfg)
    N, Lq, Lc = 4, 7, 11
    batch = dict(
        query_feat=jnp.asarray(rng.normal(size=(N, Lq, 8)), jnp.float32),
        query_mask=jnp.ones((N, Lq)),
        video_feat=jnp.asarray(rng.normal(size=(N, Lc, 12)), jnp.float32),
        video_mask=jnp.ones((N, Lc)),
        sub_feat=jnp.asarray(rng.normal(size=(N, Lc, 10)), jnp.float32),
        sub_mask=jnp.ones((N, Lc)),
        st_ed_indices=jnp.asarray([[0, 2], [1, 3], [2, 5], [0, 1]], jnp.int32),
    )
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           **batch, deterministic=True)
    loss, ld = model.apply(variables, **batch, deterministic=True)
    assert np.isfinite(float(loss))

    st, ed = model.apply(variables, batch["query_feat"], batch["query_mask"],
                         batch["video_feat"], batch["video_mask"],
                         batch["sub_feat"], batch["sub_mask"],
                         method="span_logits")
    assert st.shape == (N, Lc)

    def loss_fn(p):
        return model.apply({"params": p}, **batch, deterministic=True)[0]
    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


# ---------------------------------------------------------------------------
# MEE
# ---------------------------------------------------------------------------

def test_mee_loss_and_batchnorm_state(rng):
    from tvretrieval_tpu.models.mee import MEE, MEEConfig, max_margin_ranking_loss
    cfg = MEEConfig(text_input_size=16, vid_input_size=12, output_size=8)
    model = MEE(cfg)
    N = 6
    batch = dict(
        query_feat=jnp.asarray(rng.normal(size=(N, 10, 16)), jnp.float32),
        query_mask=jnp.ones((N, 10)),
        video_feat=jnp.asarray(rng.normal(size=(N, 12)), jnp.float32),
        sub_feat=jnp.asarray(rng.normal(size=(N, 16)), jnp.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), **batch, train=False)
    assert "batch_stats" in variables
    loss, new_state = model.apply(variables, **batch, train=True,
                                  mutable=["batch_stats"])
    assert np.isfinite(float(loss))
    # running stats must actually update
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_max_margin_loss_matches_torch_reference(rng):
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_mee_components",
        "/root/reference/baselines/mixture_embedding_experts/model_components.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    from tvretrieval_tpu.models.mee import max_margin_ranking_loss

    x = rng.normal(size=(7, 7)).astype(np.float32)
    ours = float(max_margin_ranking_loss(jnp.asarray(x), margin=0.2))
    theirs = float(ref.MaxMarginRankingLoss(margin=0.2)(torch.from_numpy(x)))
    assert ours == pytest.approx(theirs, rel=1e-5)


# ---------------------------------------------------------------------------
# CAL + proposals
# ---------------------------------------------------------------------------

def test_proposals_match_reference(rng):
    spec = importlib.util.spec_from_file_location(
        "ref_proposal",
        "/root/reference/baselines/clip_alignment_with_language/local_utils/proposal.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    from tvretrieval_tpu.data.proposals import get_proposal_interface, didemo_proposals

    ref_iface = ref.get_proposal_interface("tvr")
    ours = get_proposal_interface("tvr")
    for duration in [10.0, 33.3, 90.0, 148.5]:
        theirs = ref_iface("vid", {"duration": duration})
        mine = ours(duration)
        np.testing.assert_allclose(mine, theirs, rtol=1e-6)

    np.testing.assert_allclose(didemo_proposals(),
                               ref.DidemoICCV17SS()("x"), rtol=1e-6)


def test_proposal_cache_roundtrip(tmp_path, rng):
    import jax.numpy as jnp
    from tvretrieval_tpu.retrieval.proposal_engine import (
        ProposalCorpusCache, load_proposal_cache, save_proposal_cache)
    cache = ProposalCorpusCache(
        mean_emb_video=jnp.asarray(rng.normal(size=(4, 6, 8)), jnp.float32),
        mean_sq_video=jnp.asarray(rng.normal(size=(4, 6)), jnp.float32),
        mean_emb_sub=None, mean_sq_sub=None,
        prop_mask=jnp.ones((4, 6)),
        prop_spans=rng.normal(size=(4, 6, 2)).astype(np.float32),
        n_videos=4)
    path = str(tmp_path / "cache.npz")
    save_proposal_cache(cache, path)
    loaded = load_proposal_cache(path)
    assert loaded.mean_emb_sub is None
    np.testing.assert_allclose(np.asarray(loaded.mean_emb_video),
                               np.asarray(cache.mean_emb_video))
    assert loaded.n_videos == 4


def test_didemo_agreed_ts():
    from tvretrieval_tpu.data.datasets import didemo_agreed_ts
    assert didemo_agreed_ts([[1, 1], [1, 1], [1, 1], [0, 0]]) == [1, 1]
    assert didemo_agreed_ts([[2.5, 5.0]]) == [2.5, 5.0]


def test_cal_pdist_cdist_consistency(rng):
    from tvretrieval_tpu.models.cal import CALWithSub, CALConfig
    cfg = CALConfig(ctx_mode="video_sub", visual_input_size=10,
                    textual_input_size=8, query_feat_size=6,
                    visual_hidden_size=12, output_size=5, lstm_hidden_size=7)
    model = CALWithSub(cfg)
    N, Lq, Lc = 3, 5, 4
    batch = dict(
        query_feat=jnp.asarray(rng.normal(size=(N, Lq, 6)), jnp.float32),
        query_mask=jnp.ones((N, Lq)),
        pos_video_feat=jnp.asarray(rng.normal(size=(N, Lc, 10)), jnp.float32),
        pos_sub_feat=jnp.asarray(rng.normal(size=(N, Lc, 8)), jnp.float32),
        pos_mask=jnp.ones((N, Lc)),
        intra_video_feat=jnp.asarray(rng.normal(size=(N, Lc, 10)), jnp.float32),
        intra_sub_feat=jnp.asarray(rng.normal(size=(N, Lc, 8)), jnp.float32),
        intra_mask=jnp.ones((N, Lc)),
        inter_video_feat=jnp.asarray(rng.normal(size=(N, Lc, 10)), jnp.float32),
        inter_sub_feat=jnp.asarray(rng.normal(size=(N, Lc, 8)), jnp.float32),
        inter_mask=jnp.ones((N, Lc)),
    )
    variables = model.init(jax.random.PRNGKey(0), **batch)
    loss, _ = model.apply(variables, **batch)
    assert np.isfinite(float(loss))

    # cdist diagonal must equal pdist on matched pairs
    q = model.apply(variables, batch["query_feat"], batch["query_mask"],
                    method="encode_query")
    v_emb = model.apply(variables, batch["pos_video_feat"], "video",
                        method="encode_moments")
    s_emb = model.apply(variables, batch["pos_sub_feat"], "sub",
                        method="encode_moments")
    cdist = model.apply(variables, q, v_emb, s_emb, batch["pos_mask"],
                        method="cdist_from_encoded")
    pdist = model.apply(variables, q, batch["pos_video_feat"],
                        batch["pos_sub_feat"], batch["pos_mask"],
                        method="compute_pdist")
    np.testing.assert_allclose(np.asarray(jnp.diag(cdist)), np.asarray(pdist),
                               rtol=1e-4, atol=1e-5)

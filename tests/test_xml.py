"""XML model tests: shapes, loss behavior, and differential forward parity
against the torch reference model (weights copied torch -> flax)."""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvretrieval_tpu.models.xml import XML, XMLConfig, cosine_video_scores

HID = 64
LQ = 8
LC = 20
VDIM = 24
SDIM = 16
QDIM = 16


def small_cfg(**kw):
    base = dict(
        ctx_mode="video_sub", merge_two_stream=True, cross_att=True,
        visual_input_size=VDIM, sub_input_size=SDIM, query_input_size=QDIM,
        hidden_size=HID, n_heads=4, max_ctx_l=LC, max_desc_l=LQ,
        input_drop=0.1, drop=0.1,
    )
    base.update(kw)
    return XMLConfig(**base)


def make_batch(rng, n=6):
    def valid_mask(n, L, min_len):
        m = np.zeros((n, L), dtype=np.float32)
        for i in range(n):
            m[i, : rng.integers(min_len, L + 1)] = 1.0
        return m

    ctx_mask = valid_mask(n, LC, 5)
    batch = dict(
        query_feat=rng.normal(size=(n, LQ, QDIM)).astype(np.float32),
        query_mask=valid_mask(n, LQ, 3),
        video_feat=rng.normal(size=(n, LC, VDIM)).astype(np.float32),
        video_mask=ctx_mask,
        sub_feat=rng.normal(size=(n, LC, SDIM)).astype(np.float32),
        sub_mask=ctx_mask.copy(),
    )
    st = rng.integers(0, 4, size=n)
    ed = st + rng.integers(1, 5, size=n)
    batch["st_ed_indices"] = np.stack([st, ed], axis=1).astype(np.int32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def init_model(cfg, batch, seed=0):
    model = XML(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(1),
         "negatives": jax.random.PRNGKey(2)},
        **batch, deterministic=True)
    return model, variables


def test_train_forward_shapes_and_finite(rng):
    batch = make_batch(rng)
    model, variables = init_model(small_cfg(), batch)
    loss, loss_dict = model.apply(
        variables, **batch, lw_st_ed=jnp.float32(0.01),
        neg_sample_upper=jnp.int32(6), deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3), "negatives": jax.random.PRNGKey(4)})
    assert np.isfinite(float(loss))
    assert set(loss_dict) == {"loss_st_ed", "loss_neg_ctx", "loss_neg_q", "loss_overall"}
    assert float(loss_dict["loss_overall"]) == pytest.approx(float(loss))


def test_cross_inference_shapes(rng):
    batch = make_batch(rng)
    model, variables = init_model(small_cfg(), batch)
    vf1, vf2, sf1, sf2 = model.apply(
        variables, batch["video_feat"], batch["video_mask"],
        batch["sub_feat"], batch["sub_mask"], method=XML.encode_context)
    assert vf1.shape == (6, LC, HID)
    q2c, st, ed = model.apply(
        variables, batch["query_feat"], batch["query_mask"],
        vf1, vf2, batch["video_mask"], sf1, sf2, batch["sub_mask"],
        True, method=XML.get_pred_from_raw_query)
    assert q2c.shape == (6, 6)
    assert st.shape == (6, 6, LC)
    # masked positions must be ~ -1e10
    assert float(st[0, 0, int(batch["video_mask"][0].sum())]) < -1e9


def test_cat_linear_span_predictor(rng):
    """cat_linear variant (reference model_xml.py:532-548): additive
    query-side + context-side linear span logits, in-batch and cross."""
    batch = make_batch(rng)
    cfg = small_cfg(span_predictor_type="cat_linear", merge_two_stream=False)
    model, variables = init_model(cfg, batch)
    loss, _ = model.apply(
        variables, **batch, lw_st_ed=jnp.float32(0.01),
        neg_sample_upper=jnp.int32(6), deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3), "negatives": jax.random.PRNGKey(4)})
    assert np.isfinite(float(loss))
    vf1, vf2, sf1, sf2 = model.apply(
        variables, batch["video_feat"], batch["video_mask"],
        batch["sub_feat"], batch["sub_mask"], method=XML.encode_context)
    q2c, st, ed = model.apply(
        variables, batch["query_feat"], batch["query_mask"],
        vf1, vf2, batch["video_mask"], sf1, sf2, batch["sub_mask"],
        True, method=XML.get_pred_from_raw_query)
    assert st.shape == (6, 6, LC)


def test_stack_conv_span_predictor(rng):
    """Stacked-kernel ConvSE (reference model_xml.py:163-181, 469-480):
    one conv per kernel size over the merged similarity, combined by a
    bias-free linear. With a single kernel and identity combine weight it
    must reduce exactly to the single-conv path."""
    batch = make_batch(rng)
    cfg = small_cfg(stack_conv_predictor_conv_kernel_sizes=(3, 5, 7))
    model, variables = init_model(cfg, batch)
    loss, _ = model.apply(
        variables, **batch, lw_st_ed=jnp.float32(0.01),
        neg_sample_upper=jnp.int32(6), deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3), "negatives": jax.random.PRNGKey(4)})
    assert np.isfinite(float(loss))
    vf1, vf2, sf1, sf2 = model.apply(
        variables, batch["video_feat"], batch["video_mask"],
        batch["sub_feat"], batch["sub_mask"], method=XML.encode_context)
    q2c, st, ed = model.apply(
        variables, batch["query_feat"], batch["query_mask"],
        vf1, vf2, batch["video_mask"], sf1, sf2, batch["sub_mask"],
        True, method=XML.get_pred_from_raw_query)
    assert st.shape == (6, 6, LC)

    # reduction check: kernel_sizes=(5,) + combine weight 1 == single conv
    single_model, single_vars = init_model(small_cfg(), batch, seed=7)
    stack_model = XML(small_cfg(stack_conv_predictor_conv_kernel_sizes=(5,)))
    stack_vars = stack_model.init(
        {"params": jax.random.PRNGKey(8), "dropout": jax.random.PRNGKey(1),
         "negatives": jax.random.PRNGKey(2)}, **batch, deterministic=True)
    p = jax.tree_util.tree_map(lambda x: x, stack_vars["params"])  # copy
    sp = single_vars["params"]
    p["merged_st_predictors_0"] = sp["merged_st_predictor"]
    p["merged_ed_predictors_0"] = sp["merged_ed_predictor"]
    p["combine_st_conv"] = {"kernel": jnp.ones((1, 1), jnp.float32)}
    p["combine_ed_conv"] = {"kernel": jnp.ones((1, 1), jnp.float32)}
    for k in sp:
        if k not in ("merged_st_predictor", "merged_ed_predictor"):
            p[k] = sp[k]
    args = (batch["query_feat"], batch["query_mask"],
            vf1, vf2, batch["video_mask"], sf1, sf2, batch["sub_mask"], True)

    def outputs(m, v):
        vf1_, vf2_, sf1_, sf2_ = m.apply(
            v, batch["video_feat"], batch["video_mask"],
            batch["sub_feat"], batch["sub_mask"], method=XML.encode_context)
        return m.apply(v, batch["query_feat"], batch["query_mask"],
                       vf1_, vf2_, batch["video_mask"], sf1_, sf2_,
                       batch["sub_mask"], True,
                       method=XML.get_pred_from_raw_query)

    ref = outputs(single_model, single_vars)
    got = outputs(stack_model, {"params": p})
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_no_modular_query(rng):
    """no_modular: max-pooled single query vector for both streams
    (reference model_xml.py:406-408)."""
    batch = make_batch(rng)
    model, variables = init_model(small_cfg(no_modular=True), batch)
    vq, sq = model.apply(variables, batch["query_feat"], batch["query_mask"],
                         method=XML.encode_query)
    np.testing.assert_array_equal(np.asarray(vq), np.asarray(sq))


def test_lstm_encoder_variant(rng):
    batch = make_batch(rng)
    cfg = small_cfg(encoder_type="lstm")
    model, variables = init_model(cfg, batch)
    loss, _ = model.apply(
        variables, **batch, lw_st_ed=jnp.float32(0.01),
        neg_sample_upper=jnp.int32(6), deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3), "negatives": jax.random.PRNGKey(4)})
    assert np.isfinite(float(loss))


def test_visualization_data(rng):
    batch = make_batch(rng)
    model, variables = init_model(small_cfg(), batch)
    data = model.apply(variables, batch["query_feat"], batch["query_mask"],
                       batch["video_feat"], batch["video_mask"],
                       batch["sub_feat"], batch["sub_mask"],
                       method=XML.visualization_data)
    assert data["modular_att_scores"].shape == (6, LQ, 2)
    assert data["st_prob"].shape == (6, LC)
    # attention over valid tokens sums to 1
    np.testing.assert_allclose(
        np.asarray(data["modular_att_scores"].sum(axis=1)), 1.0, atol=1e-5)


def test_sub_only_mode(rng):
    batch = make_batch(rng)
    cfg = small_cfg(ctx_mode="sub", cross_att=False, merge_two_stream=False)
    model, variables = init_model(cfg, batch)
    loss, _ = model.apply(
        variables, **batch, lw_st_ed=jnp.float32(0.01),
        neg_sample_upper=jnp.int32(6), deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3), "negatives": jax.random.PRNGKey(4)})
    assert np.isfinite(float(loss))


def test_padding_width_invariance(rng):
    """Fixed-shape padding must not change results (SURVEY.md §7 'masked
    variable-length -> fixed-shape' hard part): the same examples padded to
    L=20 vs L=32 produce identical video-level scores and identical span
    logits everywhere EXCEPT the last conv_kernel//2 valid positions.

    The exception is inherited reference semantics: fully-masked pad rows
    get UNIFORM attention (additive -1e4 on every key -> softmax 1/L, which
    depends on L; model_components.py:277), and the ConvSE conv reads those
    pad-position similarities into its halo (model_xml.py:486-497). Only the
    boundary halo can differ; everything else must match exactly."""
    n = 4
    true_len = 14
    batch20 = make_batch(rng, n)
    # keep only true_len valid positions
    mask = np.zeros((n, LC), np.float32)
    mask[:, :true_len] = 1.0
    feats = {k: np.array(v) for k, v in batch20.items()}  # writable copies
    for k in ("video_feat", "sub_feat"):
        feats[k][:, true_len:] = 0.0
    feats["video_mask"] = mask
    feats["sub_mask"] = mask.copy()

    def widen(arr, L):
        out = np.zeros((n, L) + arr.shape[2:], arr.dtype)
        out[:, :arr.shape[1]] = arr
        return out

    # one model (pos-embed table sized for the widest padding); the same
    # params score inputs padded to L=20 and L=32
    cfg = small_cfg(max_ctx_l=32)
    model = model_wide = XML(cfg)
    b_small = {k: jnp.asarray(v) for k, v in feats.items()}
    b_wide = dict(b_small)
    for k in ("video_feat", "sub_feat", "video_mask", "sub_mask"):
        b_wide[k] = jnp.asarray(widen(feats[k], 32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "negatives": jax.random.PRNGKey(2)}, **b_wide, deterministic=True)

    def outputs(m, variables, b):
        vf1, vf2, sf1, sf2 = m.apply(variables, b["video_feat"], b["video_mask"],
                                     b["sub_feat"], b["sub_mask"],
                                     method=XML.encode_context)
        return m.apply(variables, b["query_feat"], b["query_mask"],
                       vf1, vf2, b["video_mask"], sf1, sf2, b["sub_mask"],
                       False, method=XML.get_pred_from_raw_query)

    # same params work for both widths (pos-embed table sliced per length)
    q2c_s, st_s, ed_s = outputs(model, variables, b_small)
    q2c_w, st_w, ed_w = outputs(model_wide, variables, b_wide)
    np.testing.assert_allclose(np.asarray(q2c_s), np.asarray(q2c_w),
                               rtol=1e-5, atol=1e-6)
    halo = cfg.conv_kernel_size // 2
    np.testing.assert_allclose(np.asarray(st_s)[:, :true_len - halo],
                               np.asarray(st_w)[:, :true_len - halo],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ed_s)[:, :true_len - halo],
                               np.asarray(ed_w)[:, :true_len - halo],
                               rtol=1e-5, atol=1e-6)
    # the halo difference exists but is bounded (pad-row uniform attention)
    halo_diff = np.abs(np.asarray(st_s)[:, true_len - halo:true_len]
                       - np.asarray(st_w)[:, true_len - halo:true_len]).max()
    assert halo_diff < 0.5, halo_diff


def test_cosine_scores_ignore_masked_clips(rng):
    q = jnp.asarray(rng.normal(size=(3, HID)), dtype=jnp.float32)
    f = jnp.asarray(rng.normal(size=(4, LC, HID)), dtype=jnp.float32)
    m = jnp.ones((4, LC)).at[:, 10:].set(0.0)
    s1 = cosine_video_scores(q, f, m)
    f2 = f.at[:, 10:].set(1e3)
    s2 = cosine_video_scores(q, f2, m)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    assert s1.shape == (3, 4)


# ---------------------------------------------------------------------------
# Differential parity vs the torch reference model
# ---------------------------------------------------------------------------

def _load_reference_xml():
    """Import the reference torch XML with an easydict stub (read-only)."""
    if "easydict" not in sys.modules:
        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        mod = types.ModuleType("easydict")
        mod.EasyDict = EasyDict
        sys.modules["easydict"] = mod
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from baselines.crossmodal_moment_localization.model_xml import XML as TorchXML  # noqa
    from easydict import EasyDict as edict
    return TorchXML, edict


def _torch_cfg(edict):
    return edict(
        merge_two_stream=True, cross_att=True, span_predictor_type="conv",
        encoder_type="transformer", add_pe_rnn=False,
        visual_input_size=VDIM, query_input_size=QDIM, sub_input_size=SDIM,
        hidden_size=HID, conv_kernel_size=5,
        stack_conv_predictor_conv_kernel_sizes=-1, conv_stride=1,
        max_ctx_l=LC, max_desc_l=LQ, input_drop=0.1, drop=0.1, n_heads=4,
        ctx_mode="video_sub", margin=0.1, ranking_loss_type="hinge",
        lw_neg_q=1, lw_neg_ctx=1, lw_st_ed=1, use_hard_negative=False,
        hard_pool_size=20, use_self_attention=True, no_modular=False,
        pe_type="none", initializer_range=0.02,
    )


def _copy_linear(sd, prefix, tree):
    tree["kernel"] = jnp.asarray(sd[prefix + ".weight"].numpy().T)
    if prefix + ".bias" in sd:
        tree["bias"] = jnp.asarray(sd[prefix + ".bias"].numpy())


def _copy_ln(sd, prefix, tree):
    tree["scale"] = jnp.asarray(sd[prefix + ".weight"].numpy())
    tree["bias"] = jnp.asarray(sd[prefix + ".bias"].numpy())


def _copy_linearlayer(sd, prefix, tree):
    _copy_ln(sd, prefix + ".LayerNorm", tree["ln"])
    _copy_linear(sd, prefix + ".net.1", tree["dense"])


def _copy_pos_embed(sd, prefix, tree):
    tree["pos_embed"] = jnp.asarray(sd[prefix + ".position_embeddings.weight"].numpy())
    _copy_ln(sd, prefix + ".LayerNorm", tree["ln"])


def _copy_self_attention(sd, prefix, tree):
    for name in ("query", "key", "value"):
        _copy_linear(sd, f"{prefix}.{name}", tree[name])


def _copy_bert_attention(sd, prefix, tree):
    _copy_self_attention(sd, prefix + ".self", tree["self"])
    _copy_linear(sd, prefix + ".output.dense", tree["output"]["dense"])
    _copy_ln(sd, prefix + ".output.LayerNorm", tree["output"]["ln"])


def _copy_conv1d(sd, prefix, tree):
    w = sd[prefix + ".weight"].numpy()  # (out=1, in=1, k)
    tree["conv"]["kernel"] = jnp.asarray(w.transpose(2, 1, 0))


def _torch_to_flax_params(torch_model):
    sd = {k: v.detach().cpu() for k, v in torch_model.state_dict().items()}
    import flax
    cfg = small_cfg()
    model = XML(cfg)
    rng0 = np.random.default_rng(0)
    batch = make_batch(rng0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "negatives": jax.random.PRNGKey(2)}, **batch, deterministic=True)
    p = flax.core.unfreeze(variables)["params"]

    _copy_pos_embed(sd, "query_pos_embed", p["query_pos_embed"])
    _copy_pos_embed(sd, "ctx_pos_embed", p["ctx_pos_embed"])
    _copy_linearlayer(sd, "query_input_proj", p["query_input_proj"])
    _copy_bert_attention(sd, "query_encoder", p["query_encoder"])
    for stream in ("video", "sub"):
        _copy_linearlayer(sd, f"{stream}_input_proj", p[f"{stream}_input_proj"])
        _copy_bert_attention(sd, f"{stream}_encoder1", p[f"{stream}_encoder1"])
        _copy_bert_attention(sd, f"{stream}_encoder2", p[f"{stream}_encoder2"])
        _copy_self_attention(sd, f"{stream}_cross_att", p[f"{stream}_cross_att"])
        _copy_ln(sd, f"{stream}_cross_layernorm", p[f"{stream}_cross_ln"])
        _copy_linear(sd, f"{stream}_query_linear", p[f"{stream}_query_linear"])
    p["modular_vector_mapping"]["kernel"] = jnp.asarray(
        sd["modular_vector_mapping.weight"].numpy().T)
    _copy_conv1d(sd, "merged_st_predictor", p["merged_st_predictor"])
    _copy_conv1d(sd, "merged_ed_predictor", p["merged_ed_predictor"])
    return model, {"params": p}, batch


def test_forward_parity_with_torch_reference(rng):
    torch = pytest.importorskip("torch")
    TorchXML, edict = _load_reference_xml()
    torch.manual_seed(0)
    tmodel = TorchXML(_torch_cfg(edict))
    tmodel.eval()

    model, variables, batch = _torch_to_flax_params(tmodel)

    tb = {k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()}
    tb["st_ed_indices"] = tb["st_ed_indices"].long()

    with torch.no_grad():
        tvf1, tvf2, tsf1, tsf2 = tmodel.encode_context(
            tb["video_feat"], tb["video_mask"], tb["sub_feat"], tb["sub_mask"])
        t_q2c, t_st, t_ed = tmodel.get_pred_from_raw_query(
            tb["query_feat"], tb["query_mask"], tvf1, tvf2, tb["video_mask"],
            tsf1, tsf2, tb["sub_mask"], cross=False)
        t_q2c_x, t_st_x, t_ed_x = tmodel.get_pred_from_raw_query(
            tb["query_feat"], tb["query_mask"], tvf1, tvf2, tb["video_mask"],
            tsf1, tsf2, tb["sub_mask"], cross=True)

    vf1, vf2, sf1, sf2 = model.apply(
        variables, batch["video_feat"], batch["video_mask"],
        batch["sub_feat"], batch["sub_mask"], method=XML.encode_context)
    np.testing.assert_allclose(np.asarray(vf1), tvf1.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vf2), tvf2.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sf2), tsf2.numpy(), rtol=2e-4, atol=2e-4)

    q2c, st, ed = model.apply(
        variables, batch["query_feat"], batch["query_mask"],
        vf1, vf2, batch["video_mask"], sf1, sf2, batch["sub_mask"],
        False, method=XML.get_pred_from_raw_query)
    np.testing.assert_allclose(np.asarray(q2c), t_q2c.numpy(), rtol=2e-4, atol=2e-4)
    # compare only valid (unmasked) span logits; masked slots are both -1e10
    vmask = np.asarray(batch["video_mask"]) > 0
    np.testing.assert_allclose(np.asarray(st)[vmask], t_st.numpy()[vmask],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ed)[vmask], t_ed.numpy()[vmask],
                               rtol=2e-4, atol=2e-4)

    q2c_x, st_x, ed_x = model.apply(
        variables, batch["query_feat"], batch["query_mask"],
        vf1, vf2, batch["video_mask"], sf1, sf2, batch["sub_mask"],
        True, method=XML.get_pred_from_raw_query)
    np.testing.assert_allclose(np.asarray(q2c_x), t_q2c_x.numpy(), rtol=2e-4, atol=2e-4)
    xmask = np.broadcast_to(vmask[None], st_x.shape)
    np.testing.assert_allclose(np.asarray(st_x)[xmask], t_st_x.numpy()[xmask],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ed_x)[xmask], t_ed_x.numpy()[xmask],
                               rtol=2e-4, atol=2e-4)

"""Differential test: bert_adam (optax) vs the reference torch BertAdam."""
import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvretrieval_tpu.training.optimization import bert_adam, make_lr_multiplier


def _load_reference_optim():
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "reference_optim",
        "/root/reference/baselines/crossmodal_moment_localization/optimization.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return torch, mod


def test_warmup_linear_multiplier():
    fn = make_lr_multiplier("warmup_linear", warmup=0.1, t_total=100)
    assert float(fn(jnp.asarray(0))) == 0.0
    assert float(fn(jnp.asarray(5))) == pytest.approx(0.5)
    assert float(fn(jnp.asarray(10))) == pytest.approx(1.0)
    assert float(fn(jnp.asarray(55))) == pytest.approx(0.5)
    assert float(fn(jnp.asarray(100))) == pytest.approx(0.0)


def test_ema_matches_torch_reference(rng):
    """EMA shadow trajectory vs the reference EMA class
    (optimization.py:183-216)."""
    from tvretrieval_tpu.training.optimization import ema_init, ema_update
    torch, ref = _load_reference_optim()

    decay = 0.9
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    m = torch.nn.Module()
    m.p = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    tema = ref.EMA(decay)
    tema.register("p", m.p.data)

    shadow = ema_init({"p": jnp.asarray(p0)})
    params = {"p": jnp.asarray(p0)}
    for step in range(5):
        delta = rng.normal(size=(5, 3)).astype(np.float32)
        m.p.data += torch.from_numpy(delta)
        params = {"p": params["p"] + jnp.asarray(delta)}
        tema(m, step)
        shadow = ema_update(shadow, params, decay, step=step)
        np.testing.assert_allclose(np.asarray(shadow["p"]),
                                   tema.shadow["p"].numpy(), rtol=1e-6)


def test_bert_adam_matches_torch_reference(rng):
    torch, ref = _load_reference_optim()

    shapes = {"w": (8, 4), "b": (4,), "ln": (4,)}
    init_vals = {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
    n_steps = 12
    grads_seq = [{k: rng.normal(size=s).astype(np.float32) * (3.0 if i % 3 else 0.1)
                  for k, s in shapes.items()} for i in range(n_steps)]

    lr, wd, warmup, t_total = 1e-2, 0.01, 0.1, 50

    # --- torch reference
    tparams = {k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in init_vals.items()}
    groups = [
        {"params": [tparams["w"]], "weight_decay": wd},
        {"params": [tparams["b"], tparams["ln"]], "weight_decay": 0.0},
    ]
    topt = ref.BertAdam(groups, lr=lr, warmup=warmup, t_total=t_total,
                        schedule="warmup_linear", max_grad_norm=1.0)
    for step in range(n_steps):
        topt.zero_grad()
        for k in shapes:
            tparams[k].grad = torch.from_numpy(grads_seq[step][k].copy())
        topt.step()

    # --- ours
    params = {k: jnp.asarray(v) for k, v in init_vals.items()}
    decay_mask = {"w": True, "b": False, "ln": False}
    tx = bert_adam(lr=lr, t_total=t_total, warmup=warmup, schedule="warmup_linear",
                   weight_decay=wd, decay_mask=decay_mask, max_grad_norm=1.0)
    state = tx.init(params)
    for step in range(n_steps):
        g = {k: jnp.asarray(v) for k, v in grads_seq[step].items()}
        updates, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    for k in shapes:
        np.testing.assert_allclose(
            np.asarray(params[k]), tparams[k].detach().numpy(), rtol=1e-5, atol=1e-6)


def test_decay_mask_via_model_params(rng):
    from tvretrieval_tpu.training.optimization import no_decay_mask
    params = {
        "encoder": {"dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)},
                    "ln": {"scale": jnp.ones(2), "bias": jnp.ones(2)}},
        "video_cross_ln": {"scale": jnp.ones(2), "bias": jnp.ones(2)},
        "pos_embed": jnp.ones((4, 2)),
    }
    mask = no_decay_mask(params)
    assert mask["encoder"]["dense"]["kernel"] is True
    assert mask["encoder"]["dense"]["bias"] is False
    assert mask["encoder"]["ln"]["scale"] is False
    assert mask["video_cross_ln"]["bias"] is False
    assert mask["pos_embed"] is True

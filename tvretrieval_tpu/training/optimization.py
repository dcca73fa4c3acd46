"""BertAdam-in-optax: the reference's vendored BERT optimizer semantics.

Reference baselines/crossmodal_moment_localization/optimization.py:219-338:
  * Adam moments WITHOUT bias correction
  * decoupled weight decay added to the update (not the gradient)
  * per-parameter-tensor gradient-norm clipping (clip_grad_norm_ per leaf,
    default max 1.0) applied BEFORE the moment update
  * LR multiplier schedules over progress = step / t_total, warmup_linear by
    default (optimization.py:162-171)
  * two param groups: no weight decay for biases & LayerNorm params
    (train.py:152-156)

All of it implemented as one optax GradientTransformation so the whole
optimizer step lives inside the jitted train step.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def make_lr_multiplier(schedule: str = "warmup_linear", warmup: float = 0.01,
                       t_total: int = -1) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Step -> LR multiplier in [0, 1]. Mirrors reference _LRSchedule.get_lr."""

    def fn(step: jnp.ndarray) -> jnp.ndarray:
        if t_total < 0:
            return jnp.ones_like(step, dtype=jnp.float32)
        progress = step.astype(jnp.float32) / float(t_total)
        if schedule in (None, "none", "constant"):
            return jnp.ones_like(progress)
        if schedule == "warmup_constant":
            return jnp.where(progress < warmup, progress / warmup, 1.0)
        if schedule == "warmup_linear":
            return jnp.where(
                progress < warmup,
                progress / max(warmup, 1e-9),
                jnp.maximum((progress - 1.0) / (warmup - 1.0), 0.0),
            )
        if schedule == "warmup_cosine":
            after = 0.5 * (1.0 + jnp.cos(jnp.pi * (progress - warmup) / (1 - warmup)))
            return jnp.where(progress < warmup, progress / max(warmup, 1e-9), after)
        raise ValueError(f"unknown schedule {schedule}")

    return fn


def no_decay_mask(params) -> dict:
    """True where weight decay applies. Excludes biases and LayerNorm
    scale/bias (our LN modules are named 'ln' / '*_ln'), matching the
    reference's no_decay list (train.py:152-156)."""

    def decay(path, _leaf) -> bool:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if keys and keys[-1] == "bias":
            return False
        if any(str(k) == "ln" or str(k).endswith("_ln") for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decay, params)


def ema_init(params) -> optax.Params:
    """Shadow copy for an exponential moving average of the parameters
    (reference optimization.py:183-216 EMA.register; the reference ships it
    in its optimizer module though its training path never enables it)."""
    return jax.tree.map(jnp.array, params)


def ema_update(shadow, params, decay: float = 0.999, step=None):
    """shadow <- d * shadow + (1 - d) * params with the reference's warmup
    ramp d = min(decay, (1 + step) / (10 + step)) (EMA.__call__,
    optimization.py:196-203). Pure: jit it into the train step; swap the
    shadow in for evaluation (the reference's assign/resume)."""
    d = decay if step is None else jnp.minimum(
        decay, (1.0 + step) / (10.0 + step))
    return jax.tree.map(lambda s, p: d * s + (1.0 - d) * p, shadow, params)


class BertAdamState(NamedTuple):
    step: jnp.ndarray
    m: optax.Updates
    v: optax.Updates


def bert_adam(
    lr: float,
    t_total: int = -1,
    warmup: float = 0.01,
    schedule: str = "warmup_linear",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    decay_mask: Optional[dict] = None,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    """The reference BertAdam as a single optax transformation."""

    lr_mult = make_lr_multiplier(schedule, warmup, t_total)

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return BertAdamState(step=jnp.zeros((), jnp.int32), m=zeros,
                             v=jax.tree.map(jnp.zeros_like, params))

    def clip_leaf(g):
        if max_grad_norm <= 0:
            return g
        norm = jnp.sqrt(jnp.sum(jnp.square(g)))
        scale = jnp.minimum(1.0, max_grad_norm / (norm + 1e-6))
        return g * scale

    def update(grads, state, params=None):
        assert params is not None, "bert_adam requires params (weight decay)"
        grads = jax.tree.map(clip_leaf, grads)
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state.v, grads)
        mult = lr * lr_mult(state.step)

        if decay_mask is None:
            mask = jax.tree.map(lambda _: True, params)
        else:
            mask = decay_mask

        def leaf_update(m_, v_, p, use_wd):
            u = m_ / (jnp.sqrt(v_) + eps)
            if weight_decay > 0:
                u = u + jnp.where(use_wd, weight_decay, 0.0) * p
            return -mult * u

        updates = jax.tree.map(leaf_update, m, v, params, mask)
        return updates, BertAdamState(step=state.step + 1, m=m, v=v)

    return optax.GradientTransformation(init, update)

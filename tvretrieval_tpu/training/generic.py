"""Generic jitted training loop for the baseline models (MEE / CAL / ExCL).

Same TPU pattern as XMLTrainer: one compiled train step over a 1-D data
mesh, host prefetch, static shapes. The per-model loss signature is injected
via ``loss_apply(model, variables, batch, rngs, train) ->
(loss, aux_dict, new_model_state)`` so models with mutable BatchNorm state
(MEE) and dropout RNGs (ExCL) share one loop.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import optax

from tvretrieval_tpu.data.pipeline import BatchIterator, DevicePrefetcher
from tvretrieval_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_sharding
from tvretrieval_tpu.utils.io import AverageMeter


class GenericTrainer:
    def __init__(self, model, tx: optax.GradientTransformation,
                 build_fn: Callable[[List[dict]], Dict],
                 train_rows: List[dict], bsz: int, seed: int = 2018,
                 loss_apply: Optional[Callable] = None,
                 rng_names=("dropout",), mesh=None):
        self.model = model
        self.tx = tx
        self.build_fn = build_fn
        self.train_rows = train_rows
        self.bsz = bsz
        self.seed = seed
        self.rng_names = tuple(rng_names)
        if mesh is None:
            # fit the data mesh to the batch size (batch axis must divide)
            import jax as _jax
            n_dev = len(_jax.devices())
            while bsz % n_dev:
                n_dev -= 1
            mesh = make_mesh(n_dev)
        self.mesh = mesh
        self.loss_apply = loss_apply or _default_loss_apply
        self.steps_per_epoch = max(len(train_rows) // bsz, 1)

        init_batch = {k: jnp.asarray(v) for k, v in
                      build_fn((train_rows * bsz)[:bsz]).items()}
        init_rngs = {"params": jax.random.PRNGKey(seed)}
        for i, name in enumerate(self.rng_names):
            init_rngs[name] = jax.random.PRNGKey(seed + 1 + i)
        variables = self._init_variables(init_rngs, init_batch)
        self.params = jax.device_put(variables["params"], replicate_sharding(self.mesh))
        self.model_state = jax.device_put(
            {k: v for k, v in variables.items() if k != "params"},
            replicate_sharding(self.mesh))
        self.opt_state = jax.device_put(self.tx.init(self.params),
                                        replicate_sharding(self.mesh))
        self.rng = jax.random.PRNGKey(seed + 99)
        self._step = self._make_step()

    def _init_variables(self, rngs, batch):
        return self.model.init(rngs, **batch)

    def variables(self):
        return {"params": self.params, **self.model_state}

    def _make_step(self):
        model, tx, loss_apply, rng_names = (self.model, self.tx,
                                            self.loss_apply, self.rng_names)

        @jax.jit
        def step(params, model_state, opt_state, batch, rng):
            keys = jax.random.split(rng, len(rng_names) + 1)
            rngs = dict(zip(rng_names, keys[:-1]))

            def loss_fn(p):
                loss, aux, new_state = loss_apply(
                    model, {"params": p, **model_state}, batch, rngs, True)
                return loss, (aux, new_state)

            (loss, (aux, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_state, opt_state, keys[-1], loss, aux

        return step

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        meters: Dict[str, AverageMeter] = {}
        it = BatchIterator(self.train_rows, self.bsz, shuffle=True,
                           drop_last=True, seed=self.seed)
        it.epoch = epoch
        sh = batch_sharding(self.mesh)
        prefetch = DevicePrefetcher(
            it, build_fn=lambda rows: {k: jnp.asarray(v) for k, v in
                                       self.build_fn(rows).items()},
            put_fn=lambda b: {k: jax.device_put(v, sh) for k, v in b.items()})
        # losses stay on device until epoch end (no per-step host syncs)
        step_losses = []
        for batch in prefetch:
            (self.params, self.model_state, self.opt_state, self.rng,
             loss, aux) = self._step(self.params, self.model_state,
                                     self.opt_state, batch, self.rng)
            step_losses.append({**aux, "loss": loss})
        for rec in jax.device_get(step_losses):
            for k, v in rec.items():
                meters.setdefault(k, AverageMeter()).update(float(v))
        return {k: m.avg for k, m in meters.items()}


def _default_loss_apply(model, variables, batch, rngs, train):
    loss, aux = model.apply(variables, **batch, deterministic=not train,
                            rngs=rngs)
    return loss, aux, {k: v for k, v in variables.items() if k != "params"}

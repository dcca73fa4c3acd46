"""XML training loop: jitted data-parallel train step + staged loss schedule.

Reference driver: baselines/crossmodal_moment_localization/train.py. Key
semantics kept: BertAdam with no-decay groups (train.py:151-164),
warmup_linear over n_epoch * steps_per_epoch, span loss enabled from
``train_span_start_epoch`` and hard negatives from
``hard_negative_start_epoch`` (train.py:45-48) — both threaded into the ONE
compiled step as traced scalars, early stopping on the stop-task metric
(train.py:211-236), best-checkpoint gating.

TPU-first: the step is jitted once over a 1-D data mesh (batch sharded,
params replicated; XLA inserts the grad psum), batches stream through the
DevicePrefetcher, and the whole optimizer update runs on device.
"""
from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tvretrieval_tpu.data.datasets import ExampleBuilder
from tvretrieval_tpu.data.pipeline import BatchIterator, DevicePrefetcher
from tvretrieval_tpu.models.xml import XML, XMLConfig
from tvretrieval_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_sharding
from tvretrieval_tpu.training.optimization import bert_adam, no_decay_mask
from tvretrieval_tpu.utils.io import AverageMeter

logger = logging.getLogger(__name__)


@dataclass
class TrainSettings:
    """Optimization hyper-parameters (reference config.py defaults)."""

    lr: float = 1e-4
    lr_warmup_proportion: float = 0.01
    wd: float = 0.01
    n_epoch: int = 100
    bsz: int = 128
    max_es_cnt: int = 10
    lw_st_ed: float = 0.01
    train_span_start_epoch: int = 0
    hard_negative_start_epoch: int = 20
    hard_pool_size: int = 20
    grad_clip: float = -1.0          # extra global clip; -1 disables (ref default)
    debug_max_steps: int = -1        # truncate each epoch (reference --debug)
    flush_every_steps: int = 32      # host-sync cadence inside an epoch: a
    #                                  remote-relay PJRT client batches buffer
    #                                  destroys until a sync point, so a fully
    #                                  pipelined epoch pins EVERY transferred
    #                                  batch in host RAM (~80GB/epoch at TVR
    #                                  scale). One 1-element device_get per N
    #                                  steps (~30ms) caps that at N batches.
    #                                  <=0 disables (single-fence epochs).
    prefetch_workers: int = 2        # batch-building threads (DataLoader workers)
    prebuild_examples: bool = False  # cache fixed-shape examples once; batch
                                     # building becomes pure numpy gathers
                                     # (static feature stores only)
    prebuild_dtype: str = "float32"  # "float16" halves cache RAM + gather time
    prebuild_cache_dir: str = ""     # pickle the prebuilt-example arrays here
    #                                  (few large buffers -> disk-speed IO;
    #                                  restarts skip ~45 min of 1-core builds)
    seed: int = 2018
    eval_tasks: Sequence[str] = ("VCMR", "SVMR", "VR")
    stop_task: str = "VCMR"
    # device-resident data (data/device_corpus.py): corpus context features
    # live in HBM; train steps gather them on device and run K steps per
    # dispatch under lax.scan. The last steps_per_epoch % scan_steps batches
    # of each epoch run through K=1 dispatches of the same scan body (one
    # extra compiled shape), so every epoch trains exactly steps_per_epoch
    # steps like the host path.
    scan_steps: int = 8


class XMLTrainer:
    def __init__(self, model_cfg: XMLConfig, settings: TrainSettings,
                 builder: ExampleBuilder, train_rows: List[dict],
                 mesh=None, device_data=None):
        """device_data: optional data.device_corpus.DeviceData — switches
        train/eval-loss epochs to the HBM-resident corpus path (on-device
        batch assembly, K steps per dispatch)."""
        self.model = XML(model_cfg)
        self.cfg = model_cfg
        self.s = settings
        self.builder = builder
        self.train_rows = train_rows
        self.mesh = mesh if mesh is not None else make_mesh()
        n_dev = self.mesh.devices.size
        if settings.bsz % n_dev:
            raise ValueError(f"bsz {settings.bsz} not divisible by {n_dev} devices")

        self.steps_per_epoch = max(len(train_rows) // settings.bsz, 1)
        t_total = self.steps_per_epoch * settings.n_epoch

        self.prebuilt = None
        self._eval_prebuilt = None
        self._eval_prebuilt_key = None
        self.device_data = device_data
        if settings.prebuild_examples and device_data is None:
            self.prebuilt = self._load_or_build_prebuilt(
                "train_prebuilt.pkl", train_rows, eval_labels=False)

        rng = jax.random.PRNGKey(settings.seed)
        init_batch = self._build((train_rows * settings.bsz)[: settings.bsz])
        variables = self.model.init(
            {"params": rng, "dropout": rng, "negatives": rng},
            **init_batch, deterministic=True)
        self.params = jax.device_put(variables["params"], replicate_sharding(self.mesh))

        self.tx = bert_adam(
            lr=settings.lr, t_total=t_total, warmup=settings.lr_warmup_proportion,
            schedule="warmup_linear", weight_decay=settings.wd,
            decay_mask=no_decay_mask(self.params), max_grad_norm=1.0)
        if settings.grad_clip != -1.0:
            # reference train.py:83-85: optional GLOBAL-norm clip on top of
            # BertAdam's per-param clip (applied to grads before the update)
            self.tx = optax.chain(
                optax.clip_by_global_norm(settings.grad_clip), self.tx)
        self.opt_state = jax.device_put(self.tx.init(self.params),
                                        replicate_sharding(self.mesh))
        self.rng = jax.random.PRNGKey(settings.seed + 1)
        self._step = self._make_train_step()
        self._eval_step = self._make_eval_step()
        if device_data is not None:
            self._scan_step = self._make_train_scan()
            self._dd_eval_step = self._make_device_eval_step()
        self.global_step = 0

    # ------------------------------------------------------------------ build
    def _load_or_build_prebuilt(self, name: str, rows, eval_labels: bool):
        """PrebuiltExamples, pickle-cached under settings.prebuild_cache_dir.

        The cache is a handful of large numpy buffers, so pickling runs at
        disk speed; building pays 1-core python per row (~45 min at TVR
        scale). The cache key is the caller-chosen file name — callers must
        use distinct names for distinct row sets."""
        import os
        import pickle

        from tvretrieval_tpu.data.datasets import PrebuiltExamples

        path = (os.path.join(self.s.prebuild_cache_dir, name)
                if self.s.prebuild_cache_dir else None)
        if path and os.path.exists(path):
            logger.info("loading prebuilt examples from %s", path)
            with open(path, "rb") as f:
                return pickle.load(f)
        pre = PrebuiltExamples(self.builder, rows, eval_labels=eval_labels,
                               dtype=np.dtype(self.s.prebuild_dtype))
        if path:
            from tvretrieval_tpu.utils.io import dump_pickle_throttled
            os.makedirs(self.s.prebuild_cache_dir, exist_ok=True)
            dump_pickle_throttled(pre, path)
            logger.info("cached prebuilt examples to %s", path)
        return pre

    def _build(self, rows):
        b = None
        for pre in (self.prebuilt, self._eval_prebuilt):
            if pre is not None and b is None:
                try:
                    b = pre.batch_for_rows(rows)
                except KeyError:  # rows outside this cache
                    b = None
        if b is None:
            b = self.builder.build_train_batch(rows)
        return {k: jnp.asarray(v) for k, v in b.model_inputs().items()}

    def _put(self, batch):
        n = next(iter(batch.values())).shape[0]
        # a remainder eval batch may not divide the mesh: run it replicated
        sh = (batch_sharding(self.mesh) if n % self.mesh.devices.size == 0
              else replicate_sharding(self.mesh))
        return {k: jax.device_put(v, sh) for k, v in batch.items()}

    # ------------------------------------------------------------------ steps
    def _make_train_step(self):
        model, tx = self.model, self.tx

        @jax.jit
        def step(params, opt_state, batch, rng, lw_st_ed, neg_upper):
            k_drop, k_neg, rng = jax.random.split(rng, 3)

            def loss_fn(p):
                loss, ld = model.apply(
                    {"params": p}, **batch, lw_st_ed=lw_st_ed,
                    neg_sample_upper=neg_upper, deterministic=False,
                    rngs={"dropout": k_drop, "negatives": k_neg})
                return loss, ld

            (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, rng, loss, loss_dict

        return step

    def _make_eval_step(self):
        model = self.model

        @jax.jit
        def step(params, batch, lw_st_ed, neg_upper):
            # dropout off, fixed negative sampling (reference eval pass:
            # train_epoch(training=False), train.py:178-179)
            loss, loss_dict = model.apply(
                {"params": params}, **batch, lw_st_ed=lw_st_ed,
                neg_sample_upper=neg_upper, deterministic=True)
            return loss, loss_dict

        return step

    def _make_train_scan(self):
        """K optimizer steps per dispatch over device-resident context.

        The scan body is the exact _make_train_step computation with batch
        assembly moved on-device (device_corpus.assemble_batch); the rng
        split sequence matches the per-step path, so scan_steps=1 reproduces
        the host-path trajectory bit-for-bit under float32 storage."""
        import functools

        from tvretrieval_tpu.data.device_corpus import assemble_batch

        model, tx = self.model, self.tx
        akw = self.device_data.assemble_kwargs
        max_desc_l = self.builder.max_desc_l

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def steps(params, opt_state, rng, ctx, q_feat, q_len, slots, st_ed,
                  lw_st_ed, neg_upper):
            def body(carry, xs):
                params, opt_state, rng = carry
                qf, ql, sl, se = xs
                k_drop, k_neg, rng = jax.random.split(rng, 3)
                batch = assemble_batch(ctx, qf, ql, sl, se,
                                       max_desc_l=max_desc_l, **akw)

                def loss_fn(p):
                    loss, ld = model.apply(
                        {"params": p}, **batch, lw_st_ed=lw_st_ed,
                        neg_sample_upper=neg_upper, deterministic=False,
                        rngs={"dropout": k_drop, "negatives": k_neg})
                    return loss, ld

                (loss, ld), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, rng), (loss, ld)

            (params, opt_state, rng), (losses, lds) = jax.lax.scan(
                body, (params, opt_state, rng), (q_feat, q_len, slots, st_ed))
            return params, opt_state, rng, losses, lds

        return steps

    def _make_device_eval_step(self):
        from tvretrieval_tpu.data.device_corpus import assemble_batch

        model = self.model
        akw = self.device_data.assemble_kwargs
        max_desc_l = self.builder.max_desc_l

        @jax.jit
        def step(params, ctx, q_feat, q_len, slots, st_ed, lw_st_ed, neg_upper):
            batch = assemble_batch(ctx, q_feat, q_len, slots, st_ed,
                                   max_desc_l=max_desc_l, **akw)
            loss, loss_dict = model.apply(
                {"params": params}, **batch, lw_st_ed=lw_st_ed,
                neg_sample_upper=neg_upper, deterministic=True)
            return loss, loss_dict

        return step

    # ----------------------------------------------------------------- epochs
    def _schedule(self, epoch: int):
        s = self.s
        lw = jnp.float32(s.lw_st_ed
                         if (s.train_span_start_epoch != -1
                             and epoch >= s.train_span_start_epoch) else 0.0)
        hard = (s.hard_negative_start_epoch != -1
                and epoch >= s.hard_negative_start_epoch)
        neg_upper = jnp.int32(min(1 + s.hard_pool_size, s.bsz) if hard else s.bsz)
        return lw, neg_upper

    def _chunk_sharding(self):
        """Sharding for (K, B, ...) streamed chunk arrays: batch axis 1."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        if self.mesh.devices.size == 1:
            return None
        return NamedSharding(self.mesh, P(None, "data"))

    def _train_epoch_device(self, epoch: int) -> Dict[str, float]:
        """HBM-resident corpus path: host streams only (query, slot, label)
        chunks; K steps run per dispatch (see _make_train_scan)."""
        lw, neg_upper = self._schedule(epoch)
        K = max(self.s.scan_steps, 1)
        B = self.s.bsz
        tq = self.device_data.train_queries
        ctx = self.device_data.ctx_device
        order = np.arange(len(self.train_rows))
        rng = np.random.default_rng(self.s.seed + epoch)  # = BatchIterator
        rng.shuffle(order)
        n_chunks = self.steps_per_epoch // K
        # trailing steps_per_epoch % K batches run as K=1 dispatches of the
        # SAME scan body (one extra compiled shape) so no example is silently
        # dropped; the rng split sequence simply continues, matching a
        # scan_steps=1 run of the same tail
        n_rem = self.steps_per_epoch - n_chunks * K
        sh = self._chunk_sharding()

        def chunks():
            for c in range(n_chunks):
                yield (K, order[c * K * B:(c + 1) * K * B])
            base = n_chunks * K * B
            for r in range(n_rem):
                yield (1, order[base + r * B: base + (r + 1) * B])

        def build(item):
            k, idx = item
            qf, ql, sl, se = tq.chunk(idx)
            return tuple(a.reshape((k, B) + a.shape[1:])
                         for a in (qf, ql, sl, se))

        def put(arrs):
            return tuple(jax.device_put(a, sh) if sh is not None
                         else jax.device_put(a) for a in arrs)

        from tvretrieval_tpu.data.pipeline import DevicePrefetcher
        prefetch = DevicePrefetcher(chunks(), build_fn=build, put_fn=put,
                                    n_workers=self.s.prefetch_workers)
        chunk_lds = []
        last_losses = None
        data_wait = AverageMeter()
        dispatch = AverageMeter()
        t0 = time.time()
        done_steps = 0
        for qf, ql, sl, se in prefetch:
            t1 = time.time()
            data_wait.update(t1 - t0)
            k_here = int(qf.shape[0])            # K for full chunks, 1 for tail
            (self.params, self.opt_state, self.rng, last_losses,
             lds) = self._scan_step(self.params, self.opt_state, self.rng,
                                    ctx, qf, ql, sl, se, lw, neg_upper)
            self.global_step += k_here
            done_steps += k_here
            chunk_lds.append(lds)
            if (self.s.flush_every_steps > 0
                    and done_steps % max(self.s.flush_every_steps, K) < k_here):
                jax.device_get(last_losses[-1])   # relay flush fence
            t0 = time.time()
            dispatch.update(t0 - t1)
            if 0 < self.s.debug_max_steps <= done_steps:
                break
        meters = {k: AverageMeter() for k in
                  ("loss_st_ed", "loss_neg_ctx", "loss_neg_q", "loss_overall")}
        chunk_lds = jax.device_get(chunk_lds)     # [{k: (K,)}]
        self.last_step_losses = [
            {k: float(v[i]) for k, v in ld.items()}
            for ld in chunk_lds for i in range(len(next(iter(ld.values()))))]
        for ld in self.last_step_losses:
            for k, v in ld.items():
                meters[k].update(v)
        out = {k: m.avg for k, m in meters.items()}
        out["time/data_wait_s"] = data_wait.avg
        out["time/step_dispatch_s"] = dispatch.avg
        out["steps"] = done_steps
        if self.s.debug_max_steps <= 0 and done_steps != self.steps_per_epoch:
            raise AssertionError(
                f"device epoch ran {done_steps} steps, host path would run "
                f"{self.steps_per_epoch}")
        return out

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        if self.device_data is not None:
            return self._train_epoch_device(epoch)
        lw, neg_upper = self._schedule(epoch)
        it = BatchIterator(self.train_rows, self.s.bsz, shuffle=True,
                           drop_last=True, seed=self.s.seed)
        it.epoch = epoch
        prefetch = DevicePrefetcher(it, build_fn=self._build, put_fn=self._put,
                                    n_workers=self.s.prefetch_workers)
        # keep per-step losses on device; one transfer at epoch end (a host
        # sync per step would serialize the TPU pipeline). Phase timers mirror
        # the reference's per-epoch dataloading/forward meters (train.py:51-58)
        # — note dispatch is async, so step time covers dispatch only.
        step_losses = []
        data_wait = AverageMeter()
        dispatch = AverageMeter()
        t0 = time.time()
        for batch in prefetch:
            t1 = time.time()
            data_wait.update(t1 - t0)
            self.params, self.opt_state, self.rng, loss, loss_dict = self._step(
                self.params, self.opt_state, batch, self.rng, lw, neg_upper)
            self.global_step += 1
            step_losses.append(loss_dict)
            if (self.s.flush_every_steps > 0
                    and len(step_losses) % self.s.flush_every_steps == 0):
                # periodic 1-element fence: lets the relay flush its batched
                # buffer destroys (see flush_every_steps); also bounds how
                # far the host can run ahead of the device
                jax.device_get(loss)
            t0 = time.time()
            dispatch.update(t0 - t1)
            if 0 < self.s.debug_max_steps <= len(step_losses):
                break  # reference --debug truncates epochs (train.py:96-97)
        meters = {k: AverageMeter() for k in
                  ("loss_st_ed", "loss_neg_ctx", "loss_neg_q", "loss_overall")}
        self.last_step_losses = jax.device_get(step_losses)  # per-step scalars
        for loss_dict in self.last_step_losses:
            for k, v in loss_dict.items():
                meters[k].update(float(v))
        out = {k: m.avg for k, m in meters.items()}
        out["time/data_wait_s"] = data_wait.avg
        out["time/step_dispatch_s"] = dispatch.avg
        return out

    def eval_loss_epoch(self, eval_rows: List[dict], epoch: int) -> Dict[str, float]:
        """Per-batch unweighted loss average over ALL eval batches, including
        the smaller remainder batch (reference evaluates every DataLoader
        batch, train.py:178-179 with drop_last default False). The remainder
        batch compiles one extra step shape, cached across epochs."""
        lw, neg_upper = self._schedule(epoch)
        meters = {k: AverageMeter() for k in
                  ("loss_st_ed", "loss_neg_ctx", "loss_neg_q", "loss_overall")}
        it = BatchIterator(eval_rows, self.s.bsz, shuffle=False, drop_last=False,
                           seed=self.s.seed)
        if len(it) == 0:
            return {}
        if self.device_data is not None:
            eq = self.device_data.eval_queries
            ctx = self.device_data.ctx_device
            n = len(eval_rows)
            for lo in range(0, n, self.s.bsz):
                idx = np.arange(lo, min(lo + self.s.bsz, n))
                qf, ql, sl, se = eq.chunk(idx)  # remainder at natural shape
                _, loss_dict = self._dd_eval_step(
                    self.params, ctx, *map(jnp.asarray, (qf, ql, sl, se)),
                    lw, neg_upper)
                for k, v in loss_dict.items():
                    meters[k].update(float(v))
            return {k: m.avg for k, m in meters.items()}
        if self.prebuilt is not None and self._eval_prebuilt_key != id(eval_rows):
            # eval rows recur every epoch: cache them like the train rows
            self._eval_prebuilt = self._load_or_build_prebuilt(
                "eval_prebuilt.pkl", eval_rows, eval_labels=False)
            self._eval_prebuilt_key = id(eval_rows)
        for rows in it:
            batch = self._put(self._build(rows))
            _, loss_dict = self._eval_step(self.params, batch, lw, neg_upper)
            for k, v in loss_dict.items():
                meters[k].update(float(v))
        return {k: m.avg for k, m in meters.items()}

    def variables(self):
        return {"params": self.params}

"""Per-stage wall-clock profiling on fake tensors + corpus-scale extrapolation.

Capability parity with reference baselines/profiling/profile_main.py (stage
timers with device sync + 1M-video extrapolation, :35-483) and
search_time_performance.py's storage-size calculator (:230-241). On TPU the
sync fence is a forced device->host transfer of one output element (the
remote-execution relay makes ``block_until_ready`` unreliable as a fence —
see bench.py), and ``jax.profiler.trace`` can capture a full XLA trace.

CLI:
    python -m tvretrieval_tpu.profiling.profile_models --n_videos 2000 \
        --extrapolate_videos 1000000
"""
from __future__ import annotations

import argparse
import json
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> None:
    """Fence: force ONE element to the host (indexing first — a device_get
    of the full leaf would ship megabytes through the remote-TPU tunnel and
    dominate the timing)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = jax.device_get(leaf[(0,) * leaf.ndim])


def time_stage(fn: Callable, n_warmup: int = 2, n_runs: int = 10) -> float:
    """Mean wall-clock seconds of fn(), pipelined: the n_runs dispatches
    queue back-to-back on device with ONE final fence, so the remote-TPU
    relay's ~30 ms per-fence round trip amortizes to ~3 ms (the same
    steady-state methodology as bench.py)."""
    for _ in range(n_warmup):
        _sync(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n_runs)]
    _sync(outs[-1])
    return (time.perf_counter() - t0) / n_runs


def index_storage_gb(hsz: int, n_videos: int, n_clips_per_video: int,
                     n_moments: int = 0, n_total_clips_in_moments: int = 0,
                     dtype_size: int = 4) -> Dict[str, float]:
    """Index sizes per model family (reference search_time_performance.py:230-241).
    XML stores 2 streams x 2 layers of clip features."""
    GB = 1024 ** 3
    return dict(
        mee=n_videos * hsz * dtype_size * 2.0 / GB,
        cal=n_total_clips_in_moments * hsz * dtype_size * 2.0 / GB,
        mcn=n_moments * hsz * dtype_size * 2.0 / GB,
        xml=n_videos * n_clips_per_video * hsz * dtype_size * 2.0 * 2.0 / GB,
    )


class ProfileXML:
    """Stage timings of the XML corpus-retrieval path on fake tensors."""

    def __init__(self, n_videos: int = 2000, n_clips: int = 100,
                 hidden: int = 256, query_bsz: int = 50,
                 visual_dim: int = 3074, sub_dim: int = 770,
                 query_dim: int = 768, cache_dtype: str = "bfloat16"):
        from tvretrieval_tpu.models.xml import XML, XMLConfig
        from tvretrieval_tpu.retrieval.engine import RetrievalConfig, _score_query_batch

        self.n_videos = n_videos
        self.query_bsz = query_bsz
        cfg = XMLConfig(ctx_mode="video_sub", visual_input_size=visual_dim,
                        sub_input_size=sub_dim, query_input_size=query_dim,
                        hidden_size=hidden, n_heads=4, max_ctx_l=n_clips,
                        max_desc_l=30)
        self.model = XML(cfg)
        self.rcfg = RetrievalConfig(cache_dtype_str=cache_dtype,
                                    max_vcmr_video=min(100, n_videos))
        ks = jax.random.split(jax.random.PRNGKey(0), 10)
        dummy = dict(
            query_feat=jnp.zeros((2, 30, query_dim)), query_mask=jnp.ones((2, 30)),
            video_feat=jnp.zeros((2, n_clips, visual_dim)),
            video_mask=jnp.ones((2, n_clips)),
            sub_feat=jnp.zeros((2, n_clips, sub_dim)),
            sub_mask=jnp.ones((2, n_clips)),
            st_ed_indices=jnp.zeros((2, 2), jnp.int32))
        self.variables = self.model.init(
            {"params": ks[0], "dropout": ks[1], "negatives": ks[2]},
            **dummy, deterministic=True)

        dt = self.rcfg.cache_dtype
        self.cache = [jax.random.normal(k, (n_videos, n_clips, hidden), dtype=dt)
                      for k in ks[3:7]]
        self.mask = jnp.ones((n_videos, n_clips), jnp.float32)
        self.ctx_batch = dict(
            video_feat=jax.random.normal(ks[7], (self.rcfg.context_bsz, n_clips,
                                                 visual_dim), jnp.float32),
            video_mask=jnp.ones((self.rcfg.context_bsz, n_clips)),
            sub_feat=jax.random.normal(ks[8], (self.rcfg.context_bsz, n_clips,
                                               sub_dim), jnp.float32),
            sub_mask=jnp.ones((self.rcfg.context_bsz, n_clips)))
        self.q_feat = jax.random.normal(ks[9], (query_bsz, 30, query_dim),
                                        jnp.float32)
        self.q_mask = jnp.ones((query_bsz, 30), jnp.float32)
        self.gt = jnp.zeros((query_bsz,), jnp.int32)
        self._score = _score_query_batch

    def profile(self, extrapolate_videos: Optional[int] = None,
                n_queries: int = 10000) -> Dict[str, float]:
        from tvretrieval_tpu.models.xml import XML

        model, variables = self.model, self.variables

        @jax.jit
        def encode_ctx(vars_, b):
            return model.apply(vars_, b["video_feat"], b["video_mask"],
                               b["sub_feat"], b["sub_mask"],
                               method=XML.encode_context)

        @jax.jit
        def encode_q(vars_, qf, qm):
            return model.apply(vars_, qf, qm, method=XML.encode_query)

        results: Dict[str, float] = {}
        results["encode_context_batch_s"] = time_stage(
            lambda: encode_ctx(variables, self.ctx_batch))
        results["encode_query_batch_s"] = time_stage(
            lambda: encode_q(variables, self.q_feat, self.q_mask))
        results["score_query_batch_s"] = time_stage(
            lambda: self._score(model, variables, self.rcfg, self.q_feat,
                                self.q_mask, *self.cache, self.mask, self.gt,
                                True))

        ctx_bsz = self.ctx_batch["video_mask"].shape[0]
        results["corpus_encode_total_s"] = (
            results["encode_context_batch_s"] * self.n_videos / ctx_bsz)
        results["retrieval_queries_per_sec"] = (
            self.query_bsz / results["score_query_batch_s"])
        if extrapolate_videos:
            scale = extrapolate_videos / self.n_videos
            results[f"extrapolated_{extrapolate_videos}v_retrieval_s_per_query"] = (
                results["score_query_batch_s"] * scale / self.query_bsz)
            results[f"extrapolated_{extrapolate_videos}v_encode_total_s"] = (
                results["corpus_encode_total_s"] * scale)
        return results


class ProfileXMLTrain:
    """Flagship XML train-step timing + full-TVR wall-clock extrapolation.

    Reference headline: ~4h training on 1x RTX 2080Ti, early stop ~epoch 60
    (README.md:130, BASELINE.md). TVR train split: 87,175 queries, bsz 128
    -> 681 steps/epoch.
    """

    def __init__(self, bsz: int = 128, hidden: int = 256, n_clips: int = 100,
                 visual_dim: int = 3074, sub_dim: int = 770, query_dim: int = 768,
                 dtype_str: str = "float32"):
        import optax

        from tvretrieval_tpu.models.xml import XML, XMLConfig
        from tvretrieval_tpu.training.optimization import bert_adam, no_decay_mask

        self.bsz = bsz
        rng = np.random.default_rng(0)
        self.batch = {
            "query_feat": jnp.asarray(rng.normal(size=(bsz, 30, query_dim)), jnp.float32),
            "query_mask": jnp.ones((bsz, 30), jnp.float32),
            "video_feat": jnp.asarray(rng.normal(size=(bsz, n_clips, visual_dim)), jnp.float32),
            "video_mask": jnp.ones((bsz, n_clips), jnp.float32),
            "sub_feat": jnp.asarray(rng.normal(size=(bsz, n_clips, sub_dim)), jnp.float32),
            "sub_mask": jnp.ones((bsz, n_clips), jnp.float32),
            "st_ed_indices": jnp.asarray(rng.integers(0, 50, (bsz, 2)), jnp.int32),
        }
        cfg = XMLConfig(ctx_mode="video_sub", visual_input_size=visual_dim,
                        sub_input_size=sub_dim, query_input_size=query_dim,
                        hidden_size=hidden, n_heads=4, max_ctx_l=n_clips,
                        max_desc_l=30, dtype_str=dtype_str)
        model = XML(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "negatives": jax.random.PRNGKey(2)}, **self.batch,
            deterministic=True)
        self.params = variables["params"]
        tx = bert_adam(lr=1e-4, t_total=681 * 100, warmup=0.01,
                       decay_mask=no_decay_mask(self.params))
        self.opt_state = tx.init(self.params)

        @jax.jit
        def step(params, opt_state, batch, rng):
            k1, k2, rng = jax.random.split(rng, 3)

            def loss_fn(p):
                loss, _ = model.apply({"params": p}, **batch,
                                      lw_st_ed=jnp.float32(0.01),
                                      neg_sample_upper=jnp.int32(bsz),
                                      deterministic=False,
                                      rngs={"dropout": k1, "negatives": k2})
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, rng, loss

        self._step = step

    def profile(self, steps_per_epoch: int = 681, n_epochs: int = 60) -> Dict[str, float]:
        rng = jax.random.PRNGKey(0)

        def one():
            _, _, _, loss = self._step(self.params, self.opt_state,
                                       self.batch, rng)
            return loss

        t = time_stage(one, n_warmup=2, n_runs=5)
        return {
            "train_step_s": t,
            "examples_per_sec": self.bsz / t,
            "epoch_s_extrapolated": t * steps_per_epoch,
            "full_train_hours_extrapolated": t * steps_per_epoch * n_epochs / 3600,
        }


# Reference profiling constants (profile_main.py:36-53): 1M-video corpus,
# 10K queries, 20 clips/video (5s clips over 100s), 170 proposals/video
# padded to 14 clips, hsz 256, ctx batch 400, query batch 100.
REF_N_VIDEOS = 1_000_000
REF_CTX_BSZ = 400
REF_QUERY_BSZ = 100
REF_CLIPS_PER_VIDEO = 20
REF_PROPOSALS_PER_VIDEO = 170
REF_MAX_CLIPS_PER_PROPOSAL = 14


class ProfileMEE:
    """MEE stage timers (reference ProfileMEE, profile_main.py:231-312):
    context GEU encoding, query pooling+GEU+MoE, and the corpus retrieval
    matmul — extrapolated to the 1M-video corpus."""

    def __init__(self):
        from tvretrieval_tpu.models.mee import MEE, MEEConfig

        self.model = MEE(MEEConfig(vid_input_size=3074, text_input_size=768,
                                   output_size=256))
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        self.vid = jax.random.normal(ks[0], (REF_CTX_BSZ, 3074))
        self.sub = jax.random.normal(ks[1], (REF_CTX_BSZ, 768))
        self.query = jax.random.normal(ks[2], (REF_QUERY_BSZ, 15, 768))
        dummy_q = jnp.zeros((2, 15, 768))
        self.variables = self.model.init(
            jax.random.PRNGKey(3), dummy_q, jnp.ones((2, 15)),
            jnp.zeros((2, 3074)), jnp.zeros((2, 768)), train=False)
        # retrieval stage: queries against a 100K-video encoded block
        self.block = 100_000
        self.enc_v = jax.random.normal(ks[3], (self.block, 256))
        self.enc_s = jax.random.normal(ks[4], (self.block, 256))

        m, v = self.model, self.variables
        self._enc = jax.jit(lambda vid, sub: m.apply(
            v, vid, sub, method=m.__class__.encode_context))
        self._query = jax.jit(lambda q: m.apply(
            v, q, method=m.__class__.pool_query))
        self._score = jax.jit(lambda p, ev, es: m.apply(
            v, p, ev, es, method=m.__class__.scores))

    def profile(self):
        pooled = self._query(self.query)
        r = {
            "ctx_encode_batch_s": time_stage(lambda: self._enc(self.vid, self.sub)),
            "query_encode_batch_s": time_stage(lambda: self._query(self.query)),
            "retrieval_100k_block_s": time_stage(
                lambda: self._score(pooled, self.enc_v, self.enc_s)),
        }
        r[f"extrapolated_{REF_N_VIDEOS}v_ctx_encode_s"] = (
            r["ctx_encode_batch_s"] * REF_N_VIDEOS / REF_CTX_BSZ)
        r[f"extrapolated_{REF_N_VIDEOS}v_retrieval_s_per_{REF_QUERY_BSZ}q"] = (
            r["retrieval_100k_block_s"] * REF_N_VIDEOS / self.block)
        return r


class ProfileCAL:
    """CAL stage timers (reference ProfileCAL, profile_main.py:314-375):
    proposal MLP encoding and the corpus cdist rerank over padded proposal
    batches — extrapolated to 1M videos x 170 proposals."""

    def __init__(self):
        from tvretrieval_tpu.models.cal import CALWithSub, CALConfig

        cfg = CALConfig()
        self.model = CALWithSub(cfg)
        Lc = REF_MAX_CLIPS_PER_PROPOSAL
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        z = lambda d: jnp.zeros((2, Lc, d))
        self.variables = self.model.init(
            jax.random.PRNGKey(1), jnp.zeros((2, 15, 768)), jnp.ones((2, 15)),
            z(cfg.visual_input_size), z(cfg.textual_input_size), jnp.ones((2, Lc)),
            z(cfg.visual_input_size), z(cfg.textual_input_size), jnp.ones((2, Lc)),
            z(cfg.visual_input_size), z(cfg.textual_input_size), jnp.ones((2, Lc)))
        self.mom_v = jax.random.normal(ks[0], (REF_CTX_BSZ, Lc, cfg.visual_input_size))
        self.mom_s = jax.random.normal(ks[1], (REF_CTX_BSZ, Lc, cfg.textual_input_size))
        self.query = jax.random.normal(ks[2], (REF_QUERY_BSZ, 15, 768))
        self.qmask = jnp.ones((REF_QUERY_BSZ, 15))
        # rerank block: 10K proposals (~59 videos' worth) per program
        self.n_prop = 10_000
        self.emb_v = jax.random.normal(ks[3], (self.n_prop, Lc, cfg.output_size))
        self.emb_s = jax.random.normal(ks[4], (self.n_prop, Lc, cfg.output_size))
        self.pmask = jnp.ones((self.n_prop, Lc))
        self.qemb = jax.random.normal(ks[5], (REF_QUERY_BSZ, cfg.output_size))

        m, v = self.model, self.variables
        self._enc = jax.jit(lambda mom, s: m.apply(
            v, mom, s, method=m.__class__.encode_moments), static_argnames="s")
        self._encq = jax.jit(lambda q, qm: m.apply(
            v, q, qm, method=m.__class__.encode_query))
        self._cdist = jax.jit(lambda qe, ev, es, pm: m.apply(
            v, qe, ev, es, pm, method=m.__class__.cdist_from_encoded))

    def profile(self):
        r = {
            "moment_encode_batch_s": time_stage(
                lambda: self._enc(self.mom_v, "video")),
            "query_encode_batch_s": time_stage(
                lambda: self._encq(self.query, self.qmask)),
            "cdist_10k_proposals_s": time_stage(
                lambda: self._cdist(self.qemb, self.emb_v, self.emb_s,
                                    self.pmask)),
        }
        total_props = REF_N_VIDEOS * REF_PROPOSALS_PER_VIDEO
        r[f"extrapolated_{REF_N_VIDEOS}v_moment_encode_s"] = (
            r["moment_encode_batch_s"] * 2 * total_props / REF_CTX_BSZ)
        r[f"extrapolated_{REF_N_VIDEOS}v_cdist_s_per_{REF_QUERY_BSZ}q"] = (
            r["cdist_10k_proposals_s"] * total_props / self.n_prop)
        return r


class ProfileExCL:
    """ExCL stage timers (reference ProfileExCL, profile_main.py:377-472):
    per-(query, video) span scoring — ExCL has no pre-encodable context, so
    corpus retrieval costs a full forward per pair (the reference's point:
    early fusion cannot scale; extrapolation shows why)."""

    def __init__(self):
        from tvretrieval_tpu.models.excl import ExCL, ExCLConfig

        cfg = ExCLConfig()
        self.model = ExCL(cfg)
        L = REF_CLIPS_PER_VIDEO
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        self.variables = self.model.init(
            jax.random.PRNGKey(1), jnp.zeros((2, 15, 768)), jnp.ones((2, 15)),
            jnp.zeros((2, L, cfg.visual_input_size)), jnp.ones((2, L)),
            jnp.zeros((2, L, cfg.sub_input_size)), jnp.ones((2, L)),
            jnp.zeros((2, 2), jnp.int32))
        # one query against a batch of 100 candidate videos (pair batch)
        B = REF_QUERY_BSZ
        self.q = jnp.broadcast_to(jax.random.normal(ks[0], (1, 15, 768)), (B, 15, 768))
        self.qm = jnp.ones((B, 15))
        self.vf = jax.random.normal(ks[1], (B, L, cfg.visual_input_size))
        self.sf = jax.random.normal(ks[2], (B, L, cfg.sub_input_size))
        self.cm = jnp.ones((B, L))

        m, v = self.model, self.variables
        self._spans = jax.jit(lambda q, qm, vf, vm, sf, sm: m.apply(
            v, q, qm, vf, vm, sf, sm, method=m.__class__.span_logits))

    def profile(self):
        r = {"span_scores_100pairs_s": time_stage(
            lambda: self._spans(self.q, self.qm, self.vf, self.cm,
                                self.sf, self.cm))}
        # VCMR over the full corpus = N_videos pairs per query
        r[f"extrapolated_{REF_N_VIDEOS}v_s_per_query"] = (
            r["span_scores_100pairs_s"] * REF_N_VIDEOS / 100)
        return r


def profile_data_pipeline(bsz: int = 128, n_videos: int = 200,
                          n_queries: int = 1024) -> Dict[str, float]:
    """Host batch-building cost at flagship dims (video 3072-d, sub 768-d,
    ctx 100): per-row ExampleBuilder loop vs PrebuiltExamples gather. The
    1-core host is the training bottleneck (data_wait 82ms vs 7.5ms dispatch
    in the round-1 scale run); the prebuilt path must push build time below
    the ~46ms device step."""
    from tvretrieval_tpu.data.datasets import ExampleBuilder, PrebuiltExamples
    from tvretrieval_tpu.data.synthetic import make_synthetic_world

    world = make_synthetic_world(n_videos=n_videos, n_queries=n_queries,
                                 vid_dim=3072, text_dim=768, max_clips=100,
                                 seed=0)
    builder = ExampleBuilder(
        query_source=world.query_source, video_source=world.video_source,
        sub_source=world.sub_source, ctx_mode="video_sub_tef",
        max_desc_l=30, max_ctx_l=100, clip_length=world.clip_length)
    rows = world.annotations
    batches = [rows[i:i + bsz] for i in range(0, bsz * 4, bsz)]

    def timed(fn, n=3):
        fn(batches[0])  # warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            for b in batches:
                fn(b)
            ts.append((time.perf_counter() - t0) / len(batches))
        return float(np.median(ts))

    per_row_s = timed(builder.build_train_batch)
    t0 = time.perf_counter()
    pre = PrebuiltExamples(builder, rows)
    prebuild_s = time.perf_counter() - t0
    prebuilt_s = timed(pre.batch_for_rows)
    pre16 = PrebuiltExamples(builder, rows, dtype=np.float16)
    prebuilt16_s = timed(pre16.batch_for_rows)
    return {
        "per_row_build_batch_s": per_row_s,
        "prebuilt_gather_batch_s": prebuilt_s,
        "prebuilt_f16_gather_batch_s": prebuilt16_s,
        "speedup": per_row_s / prebuilt_s,
        "speedup_f16": per_row_s / prebuilt16_s,
        "prebuild_once_s": prebuild_s,
        "cache_gb": pre.nbytes() / 1024 ** 3,
        "cache_f16_gb": pre16.nbytes() / 1024 ** 3,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description="XML stage profiler")
    parser.add_argument("--n_videos", type=int, default=2000)
    parser.add_argument("--n_clips", type=int, default=100)
    parser.add_argument("--hidden", type=int, default=256)
    parser.add_argument("--query_bsz", type=int, default=50)
    parser.add_argument("--extrapolate_videos", type=int, default=1000000)
    parser.add_argument("--trace_dir", type=str, default=None,
                        help="write a jax.profiler trace here")
    parser.add_argument("--train", action="store_true",
                        help="profile the flagship train step instead")
    parser.add_argument("--data", action="store_true",
                        help="profile host batch building (no device needed)")
    parser.add_argument("--baselines", action="store_true",
                        help="profile MEE/CAL/ExCL stage timers (reference "
                             "profile_main.py scales)")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    args = parser.parse_args(argv)

    if args.data:
        results = profile_data_pipeline()
        print(json.dumps(results, indent=2))
        return results

    if args.baselines:
        results = {}
        for name, cls in (("mee", ProfileMEE), ("cal", ProfileCAL),
                          ("excl", ProfileExCL)):
            results[name] = cls().profile()
            print(name, json.dumps(results[name]), flush=True)
        print(json.dumps(results, indent=2))
        return results

    if args.train:
        results = ProfileXMLTrain(dtype_str=args.dtype).profile()
        print(json.dumps(results, indent=2))
        return results

    prof = ProfileXML(n_videos=args.n_videos, n_clips=args.n_clips,
                      hidden=args.hidden, query_bsz=args.query_bsz)
    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            results = prof.profile(args.extrapolate_videos)
    else:
        results = prof.profile(args.extrapolate_videos)
    results["storage_gb"] = index_storage_gb(
        args.hidden, args.extrapolate_videos, 20,
        n_moments=170_000_000, n_total_clips_in_moments=1_170_946_944)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()

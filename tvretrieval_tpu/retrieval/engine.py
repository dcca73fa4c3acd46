"""Whole-corpus VCMR / SVMR / VR inference engine.

The reference pipeline (inference.py:32-445) encodes the corpus once, then
per query batch: scores every video, tops-k videos, builds the (st, ed)
joint score tensor, and finishes with host-side flat sorts + unravel_index.
Here the entire scoring path is ONE jitted program per query batch
(static shapes, MXU matmuls, on-device lax.top_k); the host only maps
meta indices to video ids and formats prediction JSON.

Pipeline per query batch (mirrors reference semantics exactly):
  1. q2c = mean of per-stream max-over-clips cosine scores  (model_xml.py:436)
  2. q2c_exp = exp(alpha * q2c)                             (inference.py:317)
  3. st/ed logits for every (query, video) via ConvSE        (model_xml.py:463-497)
  4. per-(q,v) softmax over clips                            (inference.py:321-322)
  5. top max_vcmr_video videos by q2c_exp                    (inference.py:348)
  6. joint[q,v,m,n] = st[m] * q2c_exp[v] * ed[n], masked to
     min/max span lengths                                    (inference.py:370-374)
  7. flat top max_before_nms spans per query                 (inference.py:378-386)
  8. SVMR: same joint for the GT video only                  (inference.py:195-241)
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tvretrieval_tpu.data.datasets import CorpusIndex, ExampleBuilder
from tvretrieval_tpu.models.xml import XML
from tvretrieval_tpu.ops.masking import mask_logits
from tvretrieval_tpu.ops.span import (
    banded_top_spans_from_probs,
    banded_topk_spans_grouped,
    topk_stable_blocked,
)


@dataclass(frozen=True)
class RetrievalConfig:
    """Inference knobs (reference config.py defaults in parens)."""

    q2c_alpha: float = 20.0          # (162)
    min_pred_l: int = 2              # (154)
    max_pred_l: int = 16             # (158)
    max_before_nms: int = 200        # (167)
    max_vcmr_video: int = 100        # (168)
    query_bsz: int = 50              # eval_query_bsz (61)
    context_bsz: int = 200           # eval_context_bsz (63)
    clip_length: float = 1.5
    cache_dtype_str: str = "float32"  # corpus cache dtype ("bfloat16" to halve HBM)
    # span-score path on the fast (merged two-stream conv) config:
    #   "simsweep": full-corpus merged-similarity einsum (sequential HBM
    #               reads) + tiny sim-row gather (exactness-tested vs
    #               "gather"; measured faster at corpus scale, BENCH_NOTES)
    #   "simsweep_cat": one K=2D einsum over a concatenated feat2 cache
    #               (encode_corpus stores feat2_cat instead of the two
    #               streams); halves the similarity write traffic
    #   "simsweep_cat_bf16": simsweep_cat with the corpus-wide similarity
    #               declared bf16 (rounding rel <= 2^-9, one rounding, f32
    #               conv/softmax downstream — tolerance-tested on CPU).
    #               MEASURED REALITY on this TPU toolchain: XLA's
    #               excess-precision rule (xla_allow_excess_precision,
    #               default on) keeps f32 values and the sweep is MXU-bound
    #               with the gather fused, so outputs come back BIT-EQUAL to
    #               simsweep_cat at identical speed (engine_modes, corpus
    #               scale, batches 800/1200 — BENCH_NOTES round 3). The mode
    #               matters where the similarity IS materialized narrow:
    #               other backends, XLA_FLAGS=--xla_allow_excess_precision
    #               =false, or corpora large enough that the f32 buffer
    #               cannot fit.
    #   "simsweep_cat_int8": simsweep_cat with the concatenated cache
    #               stored INT8 + per-(video, clip) f32 scales
    #               (feat2_cat_scale): the corpus-wide einsum runs
    #               s8 x s8 -> s32 on the MXU (2x the bf16 FLOP rate on
    #               v5e, half the feat2 HBM); the rescale touches only the
    #               gathered (Nq, V, L) rows. Integer accumulation is
    #               exact — the only approximation is the two input
    #               roundings (<= row_max/254 per component). NOT a parity
    #               mode: accuracy contract = trained-checkpoint metric
    #               A/B (BENCH_NOTES round 3), same as pallas_int8.
    #   "simsweep_cat_int8_flat": the int8 cat sweep as a fused Pallas
    #               kernel over the video-major flat int8 cache
    #               (ops/pallas_score.span_sim_pallas_cat_i8): the s8 dot
    #               runs at 2x the bf16 MXU rate and the s32 similarity is
    #               rescaled IN VMEM and stored bf16 in a gather-friendly
    #               (Nq, Nv_pad, lp) layout — the s32 materialization +
    #               layout copy that OOM'd "simsweep_cat_int8" at corpus
    #               scale never happens. Same integer dot as
    #               "simsweep_cat_int8" (differs only by rescale
    #               association + the bf16 store); kernel bit-equal to the
    #               XLA int8 reference (tests/test_pallas_score.py). NOT a
    #               parity mode: accuracy contract = trained-checkpoint
    #               metric A/B.
    #   "gather":   gather top-V feature rows, then sim+conv (round-2 path)
    span_score_mode: str = "gather"
    # Zero-pad the concatenated cache's clip axis (L=100) to this length at
    # cache build ("simsweep_cat"/"simsweep_cat_bf16" only; 0 = off).
    # Set to 128 so the corpus-wide (Nq, Nv, Lp) similarity is LANE-TILE
    # EXACT: with L=100 the minor dim pads 100 -> 128 in layout anyway and
    # the materializing store writes partial lanes; a 128-long logical
    # minor dim costs +28% sweep contraction FLOPs but stores at full HBM
    # efficiency and keeps the top-V row gather on the fast second-minor
    # path. The pad columns score qcat . 0 = 0 and are sliced off before
    # conv — mathematically a no-op (a PARITY mode: identical selections;
    # scores agree to backend accumulation-order slack, since the changed
    # dot shape may re-tile the contraction — same contract as simsweep
    # vs gather; tests/test_span_score_modes.py). Measured: BENCH_NOTES
    # round 4.
    span_sim_pad_l: int = 0
    # video-level q2c stage:
    #   "einsum": XLA einsum -> mask -> max (materializes (Nq, L, Nv) f32)
    #   "pallas": fused flat-cache kernel (ops/pallas_score.py
    #             video_scores_pallas_flat): the feat1 slots of the cache
    #             hold mask-free video-major (Nv_pad * LP, D) flat arrays
    #             (build_flat_feat1) and each grid step runs ONE large MXU
    #             dot per stream; bit-equal to "einsum"
    #             (tests/test_pallas_score.py)
    #   "pallas_int8": the flat caches and the normalized queries are
    #             symmetrically int8-quantized (scale 127 — rows are
    #             L2-normalized) and the dots run s8 x s8 -> s32 on the
    #             MXU: 1.7x the bf16 kernel stage time and HALF the feat1
    #             HBM (the 1M-video capacity lever). Integer accumulation
    #             and max are exact (kernel bit-equal to the XLA int8
    #             reference); the ONLY approximation is the input
    #             quantization (cosine err std ~0.0032). NOT a parity
    #             mode: accuracy contract = the trained-checkpoint metric
    #             A/B in BENCH_NOTES round 3.
    video_score_mode: str = "einsum"
    # Videos per grid step of the flat pallas video kernels — threads
    # through BOTH the cache build (build_flat_feat1 pads Nv to a chunk_v
    # multiple) and the kernel call, so they always agree. Results are
    # bit-equal across values (integer/max accumulation per video is
    # chunk-independent; tests/test_span_score_modes.py). Standalone
    # kernel sweep at corpus scale (results_scale/q4c_logs/chunks.log):
    # int8 prefers 32 (8.75 ms vs 9.04 at 16); bf16 prefers 8-16.
    video_chunk_v: int = 16
    # VCMR span top-k candidate expansion (all bit-equal to the flat
    # banded top-k; see ops/span.py):
    #   "grouped":        band-materializing expansion ((Nq, V, L, W) tensor)
    #   "grouped_shift":  row gather + one-hot W-shift reduction (~200x less
    #                     expansion traffic at corpus scale)
    #   "grouped_shift8": aligned-8-block gather + 8-lane one-hot reduction
    #                     (~L/8 less gather + shift work than grouped_shift)
    #   "grouped_shift_approx": grouped_shift with the two exact selections
    #                     replaced by TPU's hardware approximate top-k
    #                     (lax.approx_max_k at topk_approx_recall). NOT a
    #                     parity mode: accuracy contract = trained-
    #                     checkpoint metric A/B (BENCH_NOTES round 4)
    #   "grouped_shift_psort": grouped_shift with the two exact selections
    #                     run by the lane-parallel transposed bitonic
    #                     kernel (ops/pallas_sort.py) — a PARITY mode,
    #                     bit-equal to lax.top_k incl. stable tie order
    #                     (tests/test_pallas_sort.py); measured in
    #                     BENCH_NOTES round 5
    span_topk_mode: str = "grouped"
    # video top-V by lax.approx_max_k on the PRE-exp scores (fast path
    # only; takes precedence over video_topk_fused/video_topk_pre_exp).
    # NOT a parity mode — same A/B contract as grouped_shift_approx.
    video_topk_approx: bool = False
    # video top-V selection via the lane-parallel transposed bitonic
    # kernel (ops/pallas_sort.py; topk_stable_blocked_psort) — a PARITY
    # mode, bit-equal to the topk_stable_blocked selection it replaces
    # (fast path only; approx/fused/external take precedence; composes
    # with video_topk_pre_exp). Measured in BENCH_NOTES round 5.
    video_topk_psort: bool = False
    # recall target for every approx_max_k selection site
    topk_approx_recall: float = 0.99
    # run the Pallas video-score kernel in interpret mode (CPU tests only;
    # Mosaic does not lower on the CPU backend)
    pallas_interpret: bool = False
    # top-k videos on the PRE-exp cosine scores, applying exp(alpha * .)
    # only to the V selected values (exp is strictly monotone, so the
    # ranking is identical wherever exp does not collapse f32-adjacent
    # scores — and where it does, pre-exp resolves the tie at FULL f32
    # resolution; scores are equal either way). Saves the (Nq, Nv)
    # transcendental per query batch (~17M exps at corpus scale).
    video_topk_pre_exp: bool = False
    # fuse the video top-k's block-max pass into the flat video-score
    # kernel (video_score_mode "pallas"/"pallas_int8" only): the kernel
    # emits per-chunk maxima alongside the scores
    # (ops/pallas_score.video_scores_pallas_flat_bmax) and selection runs
    # ops.span.topk_from_block_max on the PRE-exp scores — skipping both
    # the separate (Nq, Nv) block-max read pass and the full-matrix exp
    # (implies the video_topk_pre_exp ranking semantics). Bit-equal
    # selection (tests/test_pallas_topk.py, tests/test_span_score_modes.py).
    video_topk_fused: bool = False

    @property
    def cat_mode(self) -> bool:
        return self.span_score_mode in ("simsweep_cat", "simsweep_cat_bf16",
                                        "simsweep_cat_int8",
                                        "simsweep_cat_int8_flat")

    @property
    def cache_dtype(self):
        return jnp.bfloat16 if self.cache_dtype_str == "bfloat16" else jnp.float32


def auto_interpret(cfg: RetrievalConfig) -> RetrievalConfig:
    """Return cfg with pallas_interpret=True when the active engine modes
    need Mosaic kernels but the backend is CPU (smoke drives / tests) —
    Mosaic only lowers on TPU; interpret mode is numerics-identical."""
    needs = (cfg.video_score_mode in ("pallas", "pallas_int8")
             or cfg.span_score_mode == "simsweep_cat_int8_flat"
             or cfg.span_topk_mode == "grouped_shift_psort"
             or getattr(cfg, "video_topk_psort", False))
    if (needs and not cfg.pallas_interpret
            and jax.default_backend() == "cpu"):
        import dataclasses
        return dataclasses.replace(cfg, pallas_interpret=True)
    return cfg


@dataclass
class CorpusCache:
    """Device-resident encoded corpus (feat1 = retrieval stream, feat2 =
    localization stream; reference compute_context_info, inference.py:32-97)."""

    video_feat1: Optional[jnp.ndarray]   # (Nv, L, D); with
    #   video_score_mode="pallas" the feat1 slots instead hold the FLAT
    #   mask-free (Nv_pad * flat_lp(L), D) layout from
    #   ops.pallas_score.build_flat_feat1 (consumed only by the fast-path
    #   kernel; streaming/sharded front-ends reject flat caches)
    video_feat2: Optional[jnp.ndarray]
    sub_feat1: Optional[jnp.ndarray]
    sub_feat2: Optional[jnp.ndarray]
    mask: jnp.ndarray                    # (Nv, L)
    n_videos: int                        # true count (<= padded Nv)
    metas: List[dict]                    # per-video {vid_name, duration}
    feat2_cat: Optional[jnp.ndarray] = None  # (Nv, L, 2D) [vf2 ; sf2] for
    #                                          span_score_mode="simsweep_cat"
    #                                          (replaces the two streams);
    #                                          int8 under "simsweep_cat_int8"
    feat2_cat_scale: Optional[jnp.ndarray] = None  # (Nv, L) f32 per-row
    #                                          quantization scales (only
    #                                          with an int8 feat2_cat)


def _maybe_pad_clip_axis(feat2_cat, cfg: RetrievalConfig):
    """Apply RetrievalConfig.span_sim_pad_l to a just-built (Nv, L, 2D)
    concatenated cache. Pad columns are exact zeros -> zero similarities,
    sliced off inside merged_st_ed_scores_simgather_cat (parity mode)."""
    pad_l = getattr(cfg, "span_sim_pad_l", 0)
    if not pad_l:
        return feat2_cat
    # mode check BEFORE the feat2_cat None check: a nonzero pad with
    # gather/simsweep/int8-flat modes must fail loudly, not silently no-op
    # (those paths never build the bf16 cat cache this pad applies to)
    if cfg.span_score_mode not in ("simsweep_cat", "simsweep_cat_bf16"):
        raise ValueError(
            "span_sim_pad_l only composes with span_score_mode="
            "'simsweep_cat'/'simsweep_cat_bf16' (the int8 flat layout has "
            f"its own SPAN_LP pad), got {cfg.span_score_mode!r}")
    if feat2_cat is None:
        return feat2_cat
    L = feat2_cat.shape[1]
    if pad_l < L:
        raise ValueError(f"span_sim_pad_l={pad_l} < cache clip length {L}")
    if pad_l == L:
        return feat2_cat
    return jnp.pad(feat2_cat, ((0, 0), (0, pad_l - L), (0, 0)))


def _video_sel(cfg: RetrievalConfig):
    """Exact video top-V selector for the fast path: the lane-parallel
    transposed-sort kernel when cfg.video_topk_psort (bit-equal —
    tests/test_pallas_sort.py), else topk_stable_blocked."""
    if getattr(cfg, "video_topk_psort", False):
        import functools as _ft

        from tvretrieval_tpu.ops.span import topk_stable_blocked_psort
        return _ft.partial(
            topk_stable_blocked_psort, block=16,
            interpret=getattr(cfg, "pallas_interpret", False))
    return topk_stable_blocked


def _uses_fast_path(model: XML) -> bool:
    """True when _score_query_batch takes the fast merged-two-stream branch
    (the only consumer of the flat pallas feat1 layout); other configs go
    through get_pred_from_raw_query, which needs (Nv, L, D) feat1."""
    c = model.cfg
    return (c.merge_two_stream and c.use_video and c.use_sub
            and c.span_predictor_type == "conv")


def encode_corpus(model: XML, variables, builder: ExampleBuilder,
                  corpus: CorpusIndex, cfg: RetrievalConfig,
                  batch_cache: Optional[list] = None) -> CorpusCache:
    """Encode every corpus video once with the context encoders.

    batch_cache: optional mutable list. Empty -> the host-built context
    batches are appended to it; non-empty -> they are reused. Per-epoch
    corpus re-encoding (train-time eval) then skips the host's per-row
    batch building entirely (the 1-core host otherwise dominates at 21.8K
    videos/epoch)."""

    @jax.jit
    def _encode(vars_, video_feat, video_mask, sub_feat, sub_mask):
        vf1, vf2, sf1, sf2 = model.apply(
            vars_, video_feat, video_mask, sub_feat, sub_mask,
            method=XML.encode_context)
        dt = cfg.cache_dtype
        cast = lambda x: None if x is None else x.astype(dt)
        # pre-normalize the retrieval stream once: cosine scoring then skips
        # re-normalizing 2 x (Nv, L, D) every query batch (L2-norm is
        # idempotent, so downstream normalize-again paths stay correct)
        norm = lambda x: None if x is None else cast(
            x / (jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                 keepdims=True) + 1e-12))
        return norm(vf1), cast(vf2), norm(sf1), cast(sf2)

    n = len(corpus)
    bsz = min(cfg.context_bsz, n)
    chunks = {"vf1": [], "vf2": [], "sf1": [], "sf2": [], "mask": []}
    use_cache = batch_cache is not None and len(batch_cache) > 0
    for bi, i in enumerate(range(0, n, bsz)):
        names = corpus.vid_names[i:i + bsz]
        durs = corpus.durations[i:i + bsz]
        pad = bsz - len(names)
        if pad:  # static batch shape: repeat last video, sliced off below
            names = names + [names[-1]] * pad
            durs = durs + [durs[-1]] * pad
        if use_cache:
            batch = batch_cache[bi]
        else:
            batch = builder.build_context_batch(names, durs)
            if batch_cache is not None:
                # cache features as float16: halves host RAM and the
                # host->device transfer each epoch (features are
                # l2-normalized; the model upcasts on entry)
                batch.video_feat = batch.video_feat.astype(np.float16)
                batch.sub_feat = batch.sub_feat.astype(np.float16)
                batch_cache.append(batch)
                batch = batch_cache[bi]
        vf1, vf2, sf1, sf2 = _encode(
            variables,
            jnp.asarray(batch.video_feat), jnp.asarray(batch.video_mask),
            jnp.asarray(batch.sub_feat), jnp.asarray(batch.sub_mask))
        keep = bsz - pad
        if vf1 is not None:
            chunks["vf1"].append(vf1[:keep])
            chunks["vf2"].append(vf2[:keep])
        if sf1 is not None:
            chunks["sf1"].append(sf1[:keep])
            chunks["sf2"].append(sf2[:keep])
        chunks["mask"].append(jnp.asarray(batch.video_mask)[:keep])

    cat = lambda key: jnp.concatenate(chunks[key], axis=0) if chunks[key] else None
    vf2_all, sf2_all = cat("vf2"), cat("sf2")
    feat2_cat = feat2_cat_scale = None
    if cfg.cat_mode and vf2_all is not None and sf2_all is not None:
        # one concatenated localization cache (same total HBM as the two
        # streams, which are dropped — only the cat path consumes feat2)
        feat2_cat = jnp.concatenate([vf2_all, sf2_all], axis=-1)
        vf2_all = sf2_all = None
        feat2_cat = _maybe_pad_clip_axis(feat2_cat, cfg)
        if cfg.span_score_mode == "simsweep_cat_int8":
            # per-(video, clip)-row symmetric quantization (feat2 is not
            # unit-norm, so scales are kept; halves the feat2 HBM)
            from tvretrieval_tpu.ops.pallas_score import quantize_rows_i8
            feat2_cat, feat2_cat_scale = quantize_rows_i8(feat2_cat)
        elif cfg.span_score_mode == "simsweep_cat_int8_flat":
            # video-major int8 flat layout for the fused Pallas sweep
            # (quantize_rows_i8 + L -> SPAN_LP zero pad in one builder)
            from tvretrieval_tpu.ops.pallas_score import build_flat_feat2_i8
            feat2_cat, feat2_cat_scale = build_flat_feat2_i8(feat2_cat)
    vf1_all, sf1_all, mask_all = cat("vf1"), cat("sf1"), cat("mask")
    if (cfg.video_score_mode in ("pallas", "pallas_int8")
            and vf1_all is not None
            and sf1_all is not None and _uses_fast_path(model)):
        # flat mask-free layout consumed by video_scores_pallas_flat
        # (one-time relayout; same HBM +4% length pad)
        from tvretrieval_tpu.ops.pallas_score import (build_flat_feat1,
                                                      quantize_unit_i8)
        vf1_all = build_flat_feat1(vf1_all, mask_all,
                                   chunk_v=cfg.video_chunk_v)
        sf1_all = build_flat_feat1(sf1_all, mask_all,
                                   chunk_v=cfg.video_chunk_v)
        if cfg.video_score_mode == "pallas_int8":
            # rows are L2-normalized: symmetric scale-127 quantization
            # (halves the feat1 HBM; consumed by the s8 MXU kernel)
            vf1_all = quantize_unit_i8(vf1_all)
            sf1_all = quantize_unit_i8(sf1_all)
    return CorpusCache(
        video_feat1=vf1_all, video_feat2=vf2_all,
        sub_feat1=sf1_all, sub_feat2=sf2_all,
        mask=mask_all, n_videos=n,
        metas=[{"vid_name": v, "duration": d}
               for v, d in zip(corpus.vid_names, corpus.durations)],
        feat2_cat=feat2_cat,
        feat2_cat_scale=feat2_cat_scale,
    )


def encode_corpus_resident(model: XML, variables, device_data,
                           corpus: CorpusIndex,
                           cfg: RetrievalConfig) -> CorpusCache:
    """encode_corpus against the HBM-resident context block
    (data/device_corpus.py) — zero host->device feature transfer per epoch.

    Equivalent to encode_corpus (exactness-tested): chunks of context_bsz
    videos are sliced from the resident block, assembled on device (TEF +
    mask from clip counts), encoded, and written into PREALLOCATED cache
    buffers via donated dynamic_update_slice — in-place, so peak HBM is
    cache + one chunk rather than 2x cache (the concat in encode_corpus
    transiently doubles the cache, which no longer fits alongside the
    resident corpus at 21.8K-video scale). The final partial chunk is
    handled by overlapping the previous one (encode is deterministic
    per-video, so rewriting rows is exact), keeping one compiled shape.
    """
    from tvretrieval_tpu.data.device_corpus import assemble_context_slice

    akw = device_data.assemble_kwargs
    ctx = device_data.ctx_device
    nv = len(corpus)
    bsz = min(cfg.context_bsz, nv)
    dt = cfg.cache_dtype
    cat_mode = cfg.cat_mode

    @jax.jit
    def _encode_chunk(vars_, ctx, start):
        # contiguous chunk: dynamic_slice (a gather here would make XLA
        # copy the whole resident byte table — see device_corpus)
        vfeat, mask, sfeat, _ = assemble_context_slice(ctx, start, bsz, **akw)
        vf1, vf2, sf1, sf2 = model.apply(
            vars_, vfeat, mask, sfeat, mask, method=XML.encode_context)
        cast = lambda x: None if x is None else x.astype(dt)
        norm = lambda x: None if x is None else cast(
            x / (jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                 keepdims=True) + 1e-12))
        return norm(vf1), cast(vf2), norm(sf1), cast(sf2), mask

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _write(buf, chunk, start):
        return jax.lax.dynamic_update_slice(
            buf, chunk, (start,) + (0,) * (buf.ndim - 1))

    starts = list(range(0, nv - bsz, bsz)) + [nv - bsz]
    bufs: Dict[str, Optional[jnp.ndarray]] = {}
    for start in starts:
        vf1, vf2, sf1, sf2, mask = _encode_chunk(
            variables, ctx, jnp.int32(start))
        parts = {"vf1": vf1, "sf1": sf1, "mask": mask}
        if cat_mode and vf2 is not None and sf2 is not None:
            parts["feat2_cat"] = jnp.concatenate([vf2, sf2], axis=-1)
        else:
            parts.update(vf2=vf2, sf2=sf2)
        for k, v in parts.items():
            if v is None:
                continue
            if k not in bufs:
                bufs[k] = jnp.zeros((nv,) + v.shape[1:], v.dtype)
            bufs[k] = _write(bufs[k], v, start)

    vf1_all, sf1_all = bufs.pop("vf1", None), bufs.pop("sf1", None)
    get = bufs.get
    if (cfg.video_score_mode in ("pallas", "pallas_int8")
            and vf1_all is not None
            and sf1_all is not None and _uses_fast_path(model)):
        # pop + rebind so the (Nv, L, D) source frees as each flat copy
        # materializes — this path exists to avoid transient cache doubling
        from tvretrieval_tpu.ops.pallas_score import (build_flat_feat1,
                                                      quantize_unit_i8)
        vf1_all = build_flat_feat1(vf1_all, bufs["mask"],
                                   chunk_v=cfg.video_chunk_v)
        sf1_all = build_flat_feat1(sf1_all, bufs["mask"],
                                   chunk_v=cfg.video_chunk_v)
        if cfg.video_score_mode == "pallas_int8":
            vf1_all = quantize_unit_i8(vf1_all)
            sf1_all = quantize_unit_i8(sf1_all)
    feat2_cat, feat2_cat_scale = bufs.pop("feat2_cat", None), None
    feat2_cat = _maybe_pad_clip_axis(feat2_cat, cfg)
    if (feat2_cat is not None
            and cfg.span_score_mode == "simsweep_cat_int8"):
        # pop + rebind: the f32 source frees once the int8 copy (half
        # size) + scales materialize (transient 1.5x of feat2_cat)
        from tvretrieval_tpu.ops.pallas_score import quantize_rows_i8
        feat2_cat, feat2_cat_scale = quantize_rows_i8(feat2_cat)
    elif (feat2_cat is not None
            and cfg.span_score_mode == "simsweep_cat_int8_flat"):
        from tvretrieval_tpu.ops.pallas_score import build_flat_feat2_i8
        feat2_cat, feat2_cat_scale = build_flat_feat2_i8(feat2_cat)
    return CorpusCache(
        video_feat1=vf1_all, video_feat2=get("vf2"),
        sub_feat1=sf1_all, sub_feat2=get("sf2"),
        mask=bufs["mask"], n_videos=nv,
        metas=[{"vid_name": v, "duration": d}
               for v, d in zip(corpus.vid_names, corpus.durations)],
        feat2_cat=feat2_cat,
        feat2_cat_scale=feat2_cat_scale,
    )


@functools.partial(jax.jit, static_argnames=("model", "cfg", "do_svmr",
                                             "use_external_vr"))
def _score_query_batch(model: XML, variables, cfg: RetrievalConfig,
                       query_feat, query_mask,
                       video_feat1, video_feat2, sub_feat1, sub_feat2,
                       ctx_mask, gt_meta_idx, do_svmr: bool,
                       use_external_vr: bool = False,
                       external_idx=None, external_scores=None,
                       feat2_cat=None, feat2_cat_scale=None):
    """One fused device program scoring a query batch against the corpus.

    Fast path (merged two-stream ConvSE, the flagship config): video-level
    scores against ALL videos (two MXU matmuls over feat1), then span
    probabilities computed only on the GATHERED top-V (+GT) video rows —
    exact-equivalent to the reference's conv-over-every-video
    (inference.py:308-374) because conv/softmax are per-row.
    """
    f32 = jnp.float32
    fast = _uses_fast_path(model)
    up = lambda x: None if x is None else x.astype(f32)

    # clamp to the corpus size: with Nv < max_vcmr_video the top-k already
    # returns only Nv videos and the st_probs[:, :V] slice must agree
    V = min(cfg.max_vcmr_video, ctx_mask.shape[0])

    if fast:
        vq, sq = model.apply(variables, query_feat, query_mask,
                             method=XML.encode_query)          # (Nq, D) x2

        def scores_prenormalized(q, feat1_n):
            # feat1 is pre-normalized at cache build; only normalize queries.
            # NOTE: a chunked-scan variant (ops.span.chunked_masked_max_scores)
            # was measured SLOWER inside this fused program (2281 vs 2748 q/s
            # at corpus scale) — the scan blocks XLA's whole-program fusion,
            # so the plain einsum stays.
            qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
            s = jnp.einsum("md,nld->mln", qn.astype(feat1_n.dtype), feat1_n,
                           preferred_element_type=jnp.float32)
            return mask_logits(s, ctx_mask.T[None]).max(axis=1)

        if cfg.video_score_mode in ("pallas", "pallas_int8"):
            # feat1 slots carry the FLAT mask-free caches (Nv_pad * LP, D)
            # built by ops.pallas_score.build_flat_feat1 at cache build;
            # ctx_mask keeps the true (Nv, L) shape for the span stage
            from tvretrieval_tpu.ops.pallas_score import (
                flat_lp, quantize_unit_i8, video_scores_pallas_flat,
                video_scores_pallas_flat_i8)
            normq = lambda q: q / (jnp.linalg.norm(q, axis=-1,
                                                   keepdims=True) + 1e-12)
            fused_bmax = None
            if getattr(cfg, "video_topk_fused", False):
                from tvretrieval_tpu.ops.pallas_score import (
                    video_scores_pallas_flat_bmax)
                if cfg.video_score_mode == "pallas_int8":
                    qvt = quantize_unit_i8(normq(vq)).T
                    qst = quantize_unit_i8(normq(sq)).T
                else:
                    qvt = normq(vq).astype(video_feat1.dtype).T
                    qst = normq(sq).astype(sub_feat1.dtype).T
                scores_pad, fused_bmax = video_scores_pallas_flat_bmax(
                    qvt, qst, video_feat1, sub_feat1,
                    n_videos=ctx_mask.shape[0],
                    lp=flat_lp(ctx_mask.shape[1]),
                    chunk_v=cfg.video_chunk_v,
                    interpret=getattr(cfg, "pallas_interpret", False))
                q2c = scores_pad[:, :ctx_mask.shape[0]]
            elif cfg.video_score_mode == "pallas_int8":
                # caches were quantized at build; quantize the normalized
                # queries the same way (s8 x s8 -> s32 MXU dots)
                q2c = video_scores_pallas_flat_i8(
                    quantize_unit_i8(normq(vq)).T,
                    quantize_unit_i8(normq(sq)).T,
                    video_feat1, sub_feat1, n_videos=ctx_mask.shape[0],
                    lp=flat_lp(ctx_mask.shape[1]),
                    chunk_v=cfg.video_chunk_v,
                    interpret=getattr(cfg, "pallas_interpret", False))
            else:
                normcast = lambda q, feat: normq(q).astype(feat.dtype)
                q2c = video_scores_pallas_flat(
                    normcast(vq, video_feat1).T, normcast(sq, sub_feat1).T,
                    video_feat1, sub_feat1, n_videos=ctx_mask.shape[0],
                    lp=flat_lp(ctx_mask.shape[1]),
                    chunk_v=cfg.video_chunk_v,
                    interpret=getattr(cfg, "pallas_interpret", False))
        else:
            fused_bmax = None
            v_scores = scores_prenormalized(vq, video_feat1)
            s_scores = scores_prenormalized(sq, sub_feat1)
            q2c = (v_scores + s_scores) / 2
        q2c_exp = jnp.exp(cfg.q2c_alpha * q2c.astype(f32))

        if use_external_vr:
            # replace internal video ranking with an external VR result
            # (reference inference.py:346-355)
            topv_idx = external_idx
            topv_scores = jnp.exp(cfg.q2c_alpha * external_scores)
        elif getattr(cfg, "video_topk_approx", False):
            # hardware approximate top-k on the pre-exp scores (exp only
            # the V survivors) — A/B-contracted, see RetrievalConfig
            topv_q2c, topv_idx = jax.lax.approx_max_k(
                q2c.astype(f32), V,
                recall_target=getattr(cfg, "topk_approx_recall", 0.99))
            topv_scores = jnp.exp(cfg.q2c_alpha * topv_q2c)
        elif fused_bmax is not None:
            # kernel-emitted block maxima: selection skips the separate
            # block-max pass AND the full-matrix exp (pre-exp semantics —
            # exp is strictly monotone; see video_topk_pre_exp)
            from tvretrieval_tpu.ops.span import topk_from_block_max
            topv_q2c, topv_idx = topk_from_block_max(
                scores_pad, fused_bmax, V,
                block=scores_pad.shape[1] // fused_bmax.shape[1])
            topv_scores = jnp.exp(cfg.q2c_alpha * topv_q2c)
        elif getattr(cfg, "video_topk_pre_exp", False):
            # exact stable top-k on the raw cosine scores; exp only the V
            # selected values (identical ranking wherever exp does not
            # collapse f32-adjacent scores — see RetrievalConfig)
            topv_q2c, topv_idx = _video_sel(cfg)(q2c.astype(f32), V)
            topv_scores = jnp.exp(cfg.q2c_alpha * topv_q2c)
        else:
            # exact stable top-k with block-max pruning (bit-equal to
            # lax.top_k, ~2x faster over the 21.8K-video axis)
            topv_scores, topv_idx = _video_sel(cfg)(q2c_exp, V)  # (Nq, V)
        gather_idx = (jnp.concatenate([topv_idx, gt_meta_idx[:, None]], axis=1)
                      if do_svmr else topv_idx)                # (Nq, V[+1])
        if cfg.span_score_mode == "simsweep_cat_int8":
            st_logits, ed_logits = model.apply(
                variables, vq, sq, feat2_cat, feat2_cat_scale, ctx_mask,
                gather_idx,
                method=XML.merged_st_ed_scores_simgather_cat_i8)
        elif cfg.span_score_mode == "simsweep_cat_int8_flat":
            st_logits, ed_logits = model.apply(
                variables, vq, sq, feat2_cat, feat2_cat_scale, ctx_mask,
                gather_idx,
                interpret=getattr(cfg, "pallas_interpret", False),
                method=XML.merged_st_ed_scores_pallas_cat_i8)
        elif cfg.cat_mode:
            st_logits, ed_logits = model.apply(
                variables, vq, sq, feat2_cat, ctx_mask, gather_idx,
                sim_dtype=(jnp.bfloat16
                           if cfg.span_score_mode == "simsweep_cat_bf16"
                           else None),
                method=XML.merged_st_ed_scores_simgather_cat)
        elif cfg.span_score_mode == "simsweep":
            # full-corpus similarity sweep (sequential feat2 reads) + tiny
            # sim-row gather — bit-equal to the feature-row gather below
            st_logits, ed_logits = model.apply(
                variables, vq, video_feat2, sq, sub_feat2, ctx_mask,
                gather_idx, method=XML.merged_st_ed_scores_simgather)
        else:
            vf2_g = video_feat2[gather_idx]                    # (Nq, V+1, L, D)
            sf2_g = sub_feat2[gather_idx]
            mask_g = ctx_mask[gather_idx]                      # (Nq, V+1, L)
            # gathered rows stay at cache dtype: the scorer consumes them
            # directly with f32 accumulation (no f32 copy in HBM)
            st_logits, ed_logits = model.apply(
                variables, vq, vf2_g, sq, sf2_g, mask_g,
                method=XML.merged_st_ed_scores_gathered)
        st_probs = jax.nn.softmax(st_logits.astype(f32), axis=-1)
        ed_probs = jax.nn.softmax(ed_logits.astype(f32), axis=-1)
        st_top, ed_top = st_probs[:, :V], ed_probs[:, :V]
    else:
        q2c, st_logits, ed_logits = model.apply(
            variables, query_feat, query_mask,
            up(video_feat1), up(video_feat2), ctx_mask,
            up(sub_feat1), up(sub_feat2), ctx_mask,
            True, method=XML.get_pred_from_raw_query)          # (Nq,Nv), (Nq,Nv,L)
        q2c_exp = jnp.exp(cfg.q2c_alpha * q2c.astype(f32))
        st_probs = jax.nn.softmax(st_logits.astype(f32), axis=-1)
        ed_probs = jax.nn.softmax(ed_logits.astype(f32), axis=-1)
        if use_external_vr:
            topv_idx = external_idx
            topv_scores = jnp.exp(cfg.q2c_alpha * external_scores)
        elif getattr(cfg, "video_topk_pre_exp", False):
            topv_q2c, topv_idx = jax.lax.top_k(q2c.astype(f32), V)
            topv_scores = jnp.exp(cfg.q2c_alpha * topv_q2c)
        else:
            topv_scores, topv_idx = jax.lax.top_k(q2c_exp, V)
        st_top = jnp.take_along_axis(st_probs, topv_idx[:, :, None], axis=1)
        ed_top = jnp.take_along_axis(ed_probs, topv_idx[:, :, None], axis=1)

    # banded joint, hierarchical-exact: per-(video, start) group maxima
    # (window max of ed, monotonicity-exact) select the only groups that can
    # hold top spans; only those expand and sort. Bit-equal to the flat
    # banded top-k (ops/span.py) and 3.7x faster on v5e (14.1 -> 3.8 ms at
    # corpus scale; the Pallas streaming-sort kernel measured 21.7 ms).
    topk_mode = getattr(cfg, "span_topk_mode", "grouped")
    if topk_mode == "grouped_shift":
        from tvretrieval_tpu.ops.span import banded_topk_spans_grouped_shift
        span_topk = banded_topk_spans_grouped_shift
    elif topk_mode == "grouped_shift8":
        from tvretrieval_tpu.ops.span import banded_topk_spans_grouped_shift8
        span_topk = banded_topk_spans_grouped_shift8
    elif topk_mode == "grouped_shift_approx":
        import functools as _ft

        from tvretrieval_tpu.ops.span import (
            banded_topk_spans_grouped_shift_approx)
        span_topk = _ft.partial(
            banded_topk_spans_grouped_shift_approx,
            recall=getattr(cfg, "topk_approx_recall", 0.99))
    elif topk_mode == "grouped_shift_psort":
        import functools as _ft

        from tvretrieval_tpu.ops.span import (
            banded_topk_spans_grouped_shift_psort)
        span_topk = _ft.partial(
            banded_topk_spans_grouped_shift_psort,
            interpret=getattr(cfg, "pallas_interpret", False))
    else:
        span_topk = banded_topk_spans_grouped
    vcmr_vid_local, vcmr_st, vcmr_ed, vcmr_scores = span_topk(
        st_top, ed_top, topv_scores, cfg.min_pred_l, cfg.max_pred_l,
        cfg.max_before_nms)

    out = dict(
        topv_scores=topv_scores, topv_idx=topv_idx,
        vcmr_vid_local=vcmr_vid_local, vcmr_st=vcmr_st, vcmr_ed=vcmr_ed,
        vcmr_scores=vcmr_scores,
    )
    if do_svmr:
        if fast:
            st_gt, ed_gt = st_probs[:, V], ed_probs[:, V]      # gathered GT row
        else:
            take_gt = lambda p: jnp.take_along_axis(
                p, gt_meta_idx[:, None, None], axis=1)[:, 0]   # (Nq, L)
            st_gt, ed_gt = take_gt(st_probs), take_gt(ed_probs)
        svmr_st, svmr_ed, svmr_scores = banded_top_spans_from_probs(
            st_gt, ed_gt, cfg.min_pred_l, cfg.max_pred_l, cfg.max_before_nms)
        out.update(svmr_st=svmr_st, svmr_ed=svmr_ed, svmr_scores=svmr_scores)
    return out


def load_external_vr_submission(path: str, corpus: CorpusIndex,
                                cache_metas: List[dict], top_n: int):
    """VR submission JSON -> {desc_id: (meta_idx_list, score_list)}
    (reference load_external_vr_res2 + meta mapping, inference.py:244-273)."""
    from tvretrieval_tpu.utils.io import load_json

    sub = load_json(path)
    video_idx2meta = {corpus.video2idx[m["vid_name"]]: i
                      for i, m in enumerate(cache_metas)}
    out = {}
    for e in sub["VR"]:
        preds = e["predictions"][:top_n]
        out[e["desc_id"]] = ([video_idx2meta[p[0]] for p in preds],
                             [p[3] for p in preds])
    return out


def retrieve(model: XML, variables, builder: ExampleBuilder, cache: CorpusCache,
             query_rows: List[dict], corpus: CorpusIndex, cfg: RetrievalConfig,
             tasks: Sequence[str] = ("VCMR", "SVMR", "VR"),
             external_vr_path: Optional[str] = None,
             return_arrays: bool = False,
             query_table=None,
             streaming_host=None,
             streaming_block_videos: int = 2048,
             streaming_mesh=None) -> Dict[str, list]:
    """Score all queries against the cached corpus; return submission dict
    entries per task (reference compute_query2ctx_info, inference.py:252-445).

    external_vr_path: optional VR submission whose top videos/scores replace
    the internal video ranking (reference --external_inference_vr_res_path).
    return_arrays: return row-aligned numpy arrays for
    eval_retrieval_arrays instead of prediction dicts (per-epoch eval path).
    query_table: optional data.device_corpus.QueryTable row-aligned with
    query_rows — query features then stream quantized and are assembled on
    device, skipping the host's per-row batch building each epoch.
    streaming_host: optional retrieval.streaming.HostCorpusCache — score
    each query batch through the beyond-HBM streaming engine instead of
    the in-HBM fused program (cache is still consulted for video metas;
    its device arrays may be dropped). streaming_block_videos /
    streaming_mesh forward to streaming_score_query_batch. External VR is
    not supported on the streaming path.
    """
    do_svmr = "SVMR" in tasks
    if streaming_host is not None and external_vr_path:
        raise ValueError("external VR is not supported on the streaming "
                         "path (score in-HBM or merge externally)")
    vid2meta = {m["vid_name"]: i for i, m in enumerate(cache.metas)}
    meta_video_idx = np.asarray(
        [corpus.video2idx[m["vid_name"]] for m in cache.metas], dtype=np.int64)
    external = (load_external_vr_submission(external_vr_path, corpus,
                                            cache.metas, cfg.max_vcmr_video)
                if external_vr_path else None)

    n_q = len(query_rows)
    if n_q == 0:
        return {}
    if query_table is not None and len(query_table.q_len) != n_q:
        raise ValueError("query_table must be row-aligned with query_rows")
    _assemble_q = None
    if query_table is not None:
        from tvretrieval_tpu.data.device_corpus import assemble_queries
        _assemble_q = jax.jit(assemble_queries,
                              static_argnames=("dtype_name", "max_desc_l"))
    bsz = min(cfg.query_bsz, n_q)
    collected = []
    for i in range(0, n_q, bsz):
        rows = query_rows[i:i + bsz]
        pad = bsz - len(rows)
        if pad:
            rows = rows + [rows[-1]] * pad
        if query_table is not None:
            idx = np.minimum(np.arange(i, i + bsz), n_q - 1)
            qf, ql, _, _ = query_table.chunk(idx)
            q_feat, q_mask = _assemble_q(
                jnp.asarray(qf), jnp.asarray(ql),
                dtype_name=query_table.dtype_name,
                max_desc_l=query_table.max_desc_l)
        else:
            qb = builder.build_query_batch(rows)
            q_feat, q_mask = jnp.asarray(qb.query_feat), jnp.asarray(qb.query_mask)
        gt_idx = np.asarray(
            [vid2meta.get(r.get("vid_name") or "", 0) for r in rows], dtype=np.int32)
        ext_args = {}
        if external is not None:
            V = min(cfg.max_vcmr_video, len(cache.metas))
            ext_idx = np.zeros((bsz, V), np.int32)
            ext_scores = np.full((bsz, V), -1e10, np.float32)
            for qi, r in enumerate(rows):
                idxs, scores = external.get(r["desc_id"], ([], []))
                n = min(len(idxs), V)
                ext_idx[qi, :n] = idxs[:n]
                ext_scores[qi, :n] = scores[:n]
            ext_args = dict(use_external_vr=True,
                            external_idx=jnp.asarray(ext_idx),
                            external_scores=jnp.asarray(ext_scores))
        if cache.feat2_cat is not None:
            ext_args["feat2_cat"] = cache.feat2_cat
        if cache.feat2_cat_scale is not None:
            ext_args["feat2_cat_scale"] = cache.feat2_cat_scale
        if streaming_host is not None:
            from tvretrieval_tpu.retrieval.streaming import (
                streaming_score_query_batch)
            out = streaming_score_query_batch(
                model, variables, cfg, q_feat, q_mask, streaming_host,
                gt_meta_idx=gt_idx if do_svmr else None,
                block_videos=streaming_block_videos, mesh=streaming_mesh)
        else:
            out = _score_query_batch(
                model, variables, cfg,
                q_feat, q_mask,
                cache.video_feat1, cache.video_feat2,
                cache.sub_feat1, cache.sub_feat2,
                cache.mask, jnp.asarray(gt_idx), do_svmr, **ext_args)
        out = {k: np.asarray(v) for k, v in out.items()}
        keep = bsz - pad
        collected.append({k: v[:keep] for k, v in out.items()})

    res = {k: np.concatenate([c[k] for c in collected], axis=0) for k in collected[0]}
    c = cfg.clip_length

    vr_res, vcmr_res, svmr_res = [], [], []
    # vectorized host-side conversion to seconds / video ids
    topv_video_idx = meta_video_idx[res["topv_idx"]]                     # (Nq, V)
    vcmr_meta_idx = np.take_along_axis(res["topv_idx"], res["vcmr_vid_local"], axis=1)
    vcmr_video_idx = meta_video_idx[vcmr_meta_idx]                       # (Nq, 200)
    vcmr_st_sec = res["vcmr_st"].astype(np.float64) * c
    vcmr_ed_sec = (res["vcmr_ed"].astype(np.float64) + 1) * c

    if return_arrays:
        # fast eval path: skip per-query dict building entirely; arrays are
        # row-aligned with query_rows (consumed by eval_retrieval_arrays and
        # convertible to a submission via arrays_to_submission)
        out = {}
        if "VCMR" in tasks:
            out["VCMR"] = (vcmr_video_idx,
                           np.stack([vcmr_st_sec, vcmr_ed_sec], axis=-1),
                           res["vcmr_scores"])
        if do_svmr:
            gt_vid = np.asarray([corpus.video2idx[r["vid_name"]]
                                 for r in query_rows])
            svmr_vid = np.broadcast_to(gt_vid[:, None], res["svmr_st"].shape)
            svmr_spans = np.stack(
                [res["svmr_st"].astype(np.float64) * c,
                 (res["svmr_ed"].astype(np.float64) + 1) * c], axis=-1)
            out["SVMR"] = (svmr_vid, svmr_spans, res["svmr_scores"])
        if "VR" in tasks:
            out["VR"] = (topv_video_idx,
                         np.zeros_like(topv_video_idx[..., None],
                                       dtype=np.float64).repeat(2, -1),
                         res["topv_scores"])
        return out

    # vectorized row assembly: one .tolist() per task instead of 2M+ python
    # float() conversions (matters at 10.9K queries x 200 predictions)
    def rows4(vid, st, ed, scores):
        return np.stack([vid.astype(np.float64), st, ed,
                         scores.astype(np.float64)], axis=-1).tolist()

    if "VR" in tasks:
        zeros = np.zeros_like(topv_video_idx[:, :100], dtype=np.float64)
        vr_rows = rows4(topv_video_idx[:, :100], zeros, zeros,
                        res["topv_scores"][:, :100])
        vr_rows = [[[int(p[0]), 0, 0, p[3]] for p in q] for q in vr_rows]
    if "VCMR" in tasks:
        vcmr_rows = rows4(vcmr_video_idx, vcmr_st_sec, vcmr_ed_sec,
                          res["vcmr_scores"])
        vcmr_rows = [[[int(p[0]), p[1], p[2], p[3]] for p in q] for q in vcmr_rows]
    if do_svmr:
        svmr_st_sec = res["svmr_st"].astype(np.float64) * c
        svmr_ed_sec = (res["svmr_ed"].astype(np.float64) + 1) * c
        gt_vid_col = np.asarray([corpus.video2idx[r["vid_name"]]
                                 for r in query_rows], dtype=np.float64)
        svmr_rows = rows4(np.broadcast_to(gt_vid_col[:, None], svmr_st_sec.shape),
                          svmr_st_sec, svmr_ed_sec, res["svmr_scores"])
        svmr_rows = [[[int(p[0]), p[1], p[2], p[3]] for p in q] for q in svmr_rows]

    for qi, row in enumerate(query_rows):
        head = dict(desc_id=row["desc_id"], desc=row.get("desc", ""))
        if "VR" in tasks:
            vr_res.append({**head, "predictions": vr_rows[qi]})
        if "VCMR" in tasks:
            vcmr_res.append({**head, "predictions": vcmr_rows[qi]})
        if do_svmr:
            svmr_res.append({**head, "predictions": svmr_rows[qi]})

    out = {}
    if vcmr_res:
        out["VCMR"] = vcmr_res
    if svmr_res:
        out["SVMR"] = svmr_res
    if vr_res:
        out["VR"] = vr_res
    return out


def arrays_to_submission(arrays: Dict[str, tuple], query_rows: List[dict],
                         top_n: int = 100) -> Dict[str, list]:
    """Convert retrieve(return_arrays=True) output into submission dicts
    (only done for the best epoch / final inference)."""
    out: Dict[str, list] = {}
    for task, (vid, spans, scores) in arrays.items():
        entries = []
        for qi, row in enumerate(query_rows):
            entries.append({
                "desc_id": row["desc_id"], "desc": row.get("desc", ""),
                "predictions": [
                    [int(v), float(st), float(ed), float(s)]
                    for v, (st, ed), s in zip(vid[qi, :top_n],
                                              spans[qi, :top_n],
                                              scores[qi, :top_n])],
            })
        out[task] = entries
    return out

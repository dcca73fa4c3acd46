"""Streaming corpus retrieval for corpora larger than HBM.

The reference's profiling extrapolates to a 1M-video corpus
(profile_main.py:36-53) — at XML's index size (search_time_performance.py:
230-241) that is ~200GB of clip features, far beyond one chip's HBM. This
engine keeps the encoded corpus in HOST memory and streams it:

  phase 1 (video ranking): feat1 blocks stream host->HBM double-buffered
      (async device_put overlaps the previous block's matmul); a running
      on-device top-V merge tracks the best videos per query.
  phase 2 (span scoring): only the global top-V (+GT) rows' feat2 are
      gathered host-side and shipped once — span scoring is identical to
      the in-HBM engine (exact same results).

Everything numerically matches the in-HBM engine (tested); only the
residency changes.

Deployment note: under a remote-relay PJRT client that journals
host->device transfers for replay (see CLAUDE.md), a long streaming
session must run with journal compaction (AXON_JOURNAL_COMPACT=1 in this
image) — phase 1 streams the whole corpus through device_put every query
batch, and an uncompacted journal would pin each block in host RAM.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tvretrieval_tpu.models.xml import XML
from tvretrieval_tpu.ops.masking import NEG_INF, mask_logits
from tvretrieval_tpu.ops.span import (
    banded_top_spans_from_probs,
    banded_topk_spans_grouped,
    banded_topk_spans_grouped_shift,
)


@dataclass
class HostCorpusCache:
    """Encoded corpus in host RAM (feat1 pre-normalized, like the HBM cache).

    flat=True: the feat1 slots hold the video-major FLAT mask-free layout
    (ops/pallas_score.build_flat_feat1's byte-identical numpy equivalent,
    (Nv * lp, D)); streamed blocks then slice CONTIGUOUS row ranges and each
    block is scored by the round-2 flat-cache Pallas kernel (one large MXU
    dot per stream — ~3x the einsum block's throughput at TVR dims,
    BENCH_NOTES). ``video_valid`` restores the exact -1e10 einsum-path
    score of fully-masked (pad) videos that the mask-free layout cannot
    represent.
    """

    video_feat1: np.ndarray   # (Nv, L, D), or (Nv * lp, D) when flat
    video_feat2: np.ndarray
    sub_feat1: np.ndarray
    sub_feat2: np.ndarray
    mask: np.ndarray          # (Nv, L)
    n_videos: int
    flat: bool = False
    lp: int = 0
    video_valid: Optional[np.ndarray] = None   # (Nv,) bool, flat mode only
    int8: bool = False        # flat feat1 blocks stored int8 (scale-127
    #                           symmetric, rows are unit-norm): HALVES the
    #                           host RAM and the per-block host->device
    #                           transfer — the dominant cost of any real
    #                           streaming deployment — and each block is
    #                           scored by the s8 MXU kernel (engine mode
    #                           "pallas_int8"'s accuracy contract applies)


def _flat_feat1_np(feat1: np.ndarray, mask: np.ndarray, lp: int) -> np.ndarray:
    """Numpy twin of ops.pallas_score._build_flat_feat1 (no video-axis pad:
    streamed blocks handle that): masked clips and the L -> lp pad hold the
    video's first VALID clip row; fully-masked videos (flagged in
    video_valid) keep row 0. Pure data movement — bytes match the device
    builder exactly."""
    nv, L, d = feat1.shape
    first = np.argmax(mask > 0, axis=1)
    fill = np.take_along_axis(feat1, first[:, None, None], axis=1)
    fixed = np.where(mask[:, :, None] > 0, feat1, fill)
    if lp > L:
        fixed = np.concatenate(
            [fixed, np.broadcast_to(fill, (nv, lp - L, d))], axis=1)
    return np.ascontiguousarray(fixed.reshape(nv * lp, d))


def _quantize_unit_i8_np(x: np.ndarray) -> np.ndarray:
    """Numpy twin of ops.pallas_score.quantize_unit_i8 (bit-identical:
    f32 multiply + round-half-even are exact IEEE ops on both)."""
    return np.clip(np.rint(x.astype(np.float32) * np.float32(127.0)),
                   -127, 127).astype(np.int8)


def host_cache_from_device(cache, flat: bool = False,
                           int8: bool = False) -> HostCorpusCache:
    """Pull an engine CorpusCache into host memory.

    flat=True converts the feat1 streams to the video-major flat layout for
    Pallas block scoring (see HostCorpusCache); the (Nv, L, D) originals are
    not kept (phase 2 only needs feat2).

    int8=True (requires flat): additionally quantizes the flat feat1
    blocks to int8 (scale-127 symmetric; rows are L2-normalized at encode
    time) — half the host RAM and half the host->device bytes per block,
    scored by the s8 MXU kernel. Same approximation contract as the
    in-HBM engine's video_score_mode="pallas_int8"."""
    if cache.video_feat1 is not None and cache.video_feat1.ndim == 2:
        raise ValueError(
            "cache holds the FLAT single-chip pallas feat1 layout (built "
            "with video_score_mode='pallas'); the streaming engine builds "
            "its own block layout — encode with video_score_mode='einsum'")
    if int8 and not flat:
        raise ValueError("int8 host blocks require flat=True (the s8 "
                         "kernel consumes the flat layout)")
    g = lambda x: np.asarray(x)
    vf1, sf1, mask = g(cache.video_feat1), g(cache.sub_feat1), g(cache.mask)
    lp = 0
    valid = None
    if flat:
        from tvretrieval_tpu.ops.pallas_score import flat_lp
        lp = flat_lp(mask.shape[1])
        valid = mask.max(axis=1) > 0
        vf1 = _flat_feat1_np(vf1, mask, lp)
        sf1 = _flat_feat1_np(sf1, mask, lp)
        if int8:
            vf1 = _quantize_unit_i8_np(vf1)
            sf1 = _quantize_unit_i8_np(sf1)
    return HostCorpusCache(
        video_feat1=vf1, video_feat2=g(cache.video_feat2),
        sub_feat1=sf1, sub_feat2=g(cache.sub_feat2),
        mask=mask, n_videos=cache.n_videos, flat=flat, lp=lp,
        video_valid=valid, int8=int8)


@functools.partial(jax.jit, static_argnames=("model",))
def _encode_queries(model: XML, variables, query_feat, query_mask):
    """Returns (raw vq, raw sq, normalized vq, normalized sq): normalization
    is only for the cosine stage; the span query-linear consumes raw vectors
    (reference model_xml.py:446 vs :459)."""
    vq, sq = model.apply(variables, query_feat, query_mask,
                         method=XML.encode_query)
    norm = lambda q: q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    return vq, sq, norm(vq), norm(sq)


@jax.jit
def _block_scores(vqn, sqn, vf1_block, sf1_block, mask_block):
    """(Nq, B) fused cosine scores for one streamed block."""
    def one(qn, feat):
        s = jnp.einsum("md,nld->mln", qn.astype(feat.dtype), feat,
                       preferred_element_type=jnp.float32)
        return mask_logits(s, mask_block.T[None]).max(axis=1)

    return (one(vqn, vf1_block) + one(sqn, sf1_block)) / 2


@functools.partial(jax.jit, static_argnames=("lp", "interpret", "mesh"))
def _block_scores_flat(vqn, sqn, vf_flat, sf_flat, valid, lp: int,
                       interpret: bool = False, mesh=None):
    """(Nq, B) block scores via the flat-cache Pallas kernel (bit-equal to
    _block_scores on the same videos; fully-masked videos restored to the
    exact -1e10 einsum value via ``valid``).

    mesh: optional 1-D "data" mesh — the kernel runs per shard under
    shard_map (pallas_call is not GSPMD-partitionable), each shard scoring
    its contiguous 1/k of the block's videos; only the (Nq, B) scores
    concatenate across ICI.

    int8 blocks (vf_flat.dtype == int8, see HostCorpusCache.int8): the
    normalized queries are quantized the same way and the s8 kernel runs —
    dispatch is by dtype, so the same jit site serves both (retraced per
    dtype)."""
    from tvretrieval_tpu.ops.pallas_score import (quantize_unit_i8,
                                                  video_scores_pallas_flat,
                                                  video_scores_pallas_flat_i8)

    is_i8 = vf_flat.dtype == jnp.int8
    if is_i8:
        qvt, qst = quantize_unit_i8(vqn).T, quantize_unit_i8(sqn).T
    else:
        qvt = vqn.astype(vf_flat.dtype).T
        qst = sqn.astype(sf_flat.dtype).T

    def score(qv, qs, vf, sf, vd):
        b = vf.shape[0] // lp
        kern = video_scores_pallas_flat_i8 if is_i8 else video_scores_pallas_flat
        s = kern(qv, qs, vf, sf, n_videos=b, lp=lp, interpret=interpret)
        return jnp.where(vd[None, :], s, NEG_INF)

    if mesh is None:
        return score(qvt, qst, vf_flat, sf_flat, valid)
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    return shard_map(score, mesh=mesh,
                     in_specs=(P(), P(), P("data"), P("data"), P("data")),
                     out_specs=P(None, "data"), check_vma=False)(
        qvt, qst, vf_flat, sf_flat, valid)


@functools.partial(jax.jit, static_argnames=("top_v",))
def _merge_topv(best_scores, best_idx, block_scores, block_offset, top_v: int):
    """Running top-V merge: (Nq, V) state x (Nq, B) new block -> (Nq, V)."""
    b = block_scores.shape[1]
    idx = jnp.arange(b, dtype=jnp.int32)[None] + block_offset
    cat_scores = jnp.concatenate([best_scores, block_scores], axis=1)
    cat_idx = jnp.concatenate([best_idx, jnp.broadcast_to(idx, block_scores.shape)],
                              axis=1)
    new_scores, sel = jax.lax.top_k(cat_scores, top_v)
    return new_scores, jnp.take_along_axis(cat_idx, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("model", "cfg", "do_svmr"))
def _span_stage(model: XML, variables, cfg, vq, sq, vf2_g, sf2_g, mask_g,
                topv_scores_cos, do_svmr: bool):
    """Identical span scoring to the in-HBM fast path, on gathered rows."""
    f32 = jnp.float32
    st_logits, ed_logits = model.apply(
        variables, vq, vf2_g, sq, sf2_g, mask_g,
        method=XML.merged_st_ed_scores_gathered)
    st_probs = jax.nn.softmax(st_logits.astype(f32), axis=-1)
    ed_probs = jax.nn.softmax(ed_logits.astype(f32), axis=-1)
    V = cfg.max_vcmr_video
    topv_exp = jnp.exp(cfg.q2c_alpha * topv_scores_cos)
    topk_mode = getattr(cfg, "span_topk_mode", "grouped")
    if topk_mode == "grouped_shift8":
        from tvretrieval_tpu.ops.span import banded_topk_spans_grouped_shift8
        span_topk = banded_topk_spans_grouped_shift8
    elif topk_mode == "grouped_shift_approx":
        # A/B-contracted approximate selection (engine.RetrievalConfig)
        from tvretrieval_tpu.ops.span import (
            banded_topk_spans_grouped_shift_approx)
        span_topk = functools.partial(
            banded_topk_spans_grouped_shift_approx,
            recall=getattr(cfg, "topk_approx_recall", 0.99))
    else:
        span_topk = (banded_topk_spans_grouped_shift
                     if topk_mode == "grouped_shift"
                     else banded_topk_spans_grouped)  # bit-equal (ops/span.py)
    vid_local, st_i, ed_i, scores = span_topk(
        st_probs[:, :V], ed_probs[:, :V], topv_exp, cfg.min_pred_l,
        cfg.max_pred_l, cfg.max_before_nms)
    out = dict(vcmr_vid_local=vid_local, vcmr_st=st_i, vcmr_ed=ed_i,
               vcmr_scores=scores, topv_scores=topv_exp)
    if do_svmr:
        svmr_st, svmr_ed, svmr_scores = banded_top_spans_from_probs(
            st_probs[:, V], ed_probs[:, V], cfg.min_pred_l, cfg.max_pred_l,
            cfg.max_before_nms)
        out.update(svmr_st=svmr_st, svmr_ed=svmr_ed, svmr_scores=svmr_scores)
    return out


def streaming_score_query_batch(model: XML, variables, cfg,
                                query_feat, query_mask,
                                host: HostCorpusCache,
                                gt_meta_idx: Optional[np.ndarray] = None,
                                block_videos: int = 2048,
                                mesh=None):
    """Score one query batch against a host-resident corpus.

    Returns the same dict as the in-HBM engine's _score_query_batch (plus
    topv_idx), with identical numerics.

    mesh: optional 1-D device mesh ("data" axis). Each streamed block is
    device_put sharded over its VIDEO axis, so every chip holds 1/k of the
    block in HBM and runs 1/k of the scoring matmul; only the tiny (Nq, B)
    block scores cross ICI for the running top-V merge. This composes the
    beyond-HBM streaming path with multi-chip corpus sharding (the 1M-video
    deployment shape: corpus in host RAM, scoring striped over a slice).
    """
    do_svmr = gt_meta_idx is not None
    nq = query_feat.shape[0]
    V = cfg.max_vcmr_video

    vq, sq, vqn, sqn = _encode_queries(model, variables, jnp.asarray(query_feat),
                                       jnp.asarray(query_mask))

    # ---- phase 1: stream feat1 blocks, running top-V merge
    n = host.n_videos if host.flat else host.video_feat1.shape[0]
    best_scores = jnp.full((nq, V), -jnp.inf, jnp.float32)
    best_idx = jnp.zeros((nq, V), jnp.int32)
    interpret = bool(getattr(cfg, "pallas_interpret", False))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = mesh.devices.size
        # flat blocks additionally need a whole number of kernel chunks
        # (chunk_v = 16 videos) per shard
        mult = n_dev * (16 if host.flat else 1)
        block_videos = ((block_videos + mult - 1) // mult) * mult
        block_sharding = NamedSharding(mesh, P("data"))
        put = lambda a: jax.device_put(a, block_sharding)
    else:
        put = jax.device_put

    def blocks():
        lp = host.lp
        for off in range(0, n, block_videos):
            end = min(off + block_videos, n)
            pad = block_videos - (end - off)
            zpad = lambda a, p: (a if not p else np.concatenate(
                [a, np.zeros((p,) + a.shape[1:], a.dtype)]))
            if host.flat:
                # contiguous row-range slice of the video-major flat cache;
                # pad videos are all-zero rows, masked to the exact -1e10
                # einsum value via the validity vector
                vf = zpad(host.video_feat1[off * lp:end * lp], pad * lp)
                sf = zpad(host.sub_feat1[off * lp:end * lp], pad * lp)
                vd = np.zeros((block_videos,), bool)
                vd[: end - off] = host.video_valid[off:end]
                yield off, (put(vf), put(sf), put(vd))
            else:
                vf = zpad(host.video_feat1[off:end], pad)
                sf = zpad(host.sub_feat1[off:end], pad)
                mk = zpad(host.mask[off:end], pad)
                yield off, (put(vf), put(sf), put(mk))

    # double-buffer: device_put of the next block overlaps this block's matmul
    it = blocks()
    pending = next(it, None)
    while pending is not None:
        off, (vf, sf, third) = pending
        pending = next(it, None)  # enqueue next host->HBM copy
        if host.flat:
            scores = _block_scores_flat(vqn, sqn, vf, sf, third, lp=host.lp,
                                        interpret=interpret, mesh=mesh)
        else:
            scores = _block_scores(vqn, sqn, vf, sf, third)
        best_scores, best_idx = _merge_topv(
            best_scores, best_idx, scores, jnp.int32(off), V)

    # ---- phase 2: host gather of top-V (+GT) feat2 rows, one shipment
    top_idx = np.clip(np.asarray(best_idx), 0, n - 1)           # (Nq, V)
    gather_idx = (np.concatenate([top_idx, np.asarray(gt_meta_idx)[:, None]],
                                 axis=1) if do_svmr else top_idx)
    vf2_g = host.video_feat2[gather_idx]                        # (Nq, V[+1], L, D)
    sf2_g = host.sub_feat2[gather_idx]
    mask_g = host.mask[gather_idx]

    out = _span_stage(model, variables, cfg, vq, sq,
                      jnp.asarray(vf2_g), jnp.asarray(sf2_g),
                      jnp.asarray(mask_g), best_scores, do_svmr)
    out = {k: np.asarray(v) for k, v in out.items()}
    out["topv_idx"] = top_idx
    return out

"""Corpus-sharded multi-chip retrieval (SURVEY.md §2.6).

The encoded-corpus cache is sharded over the VIDEO axis of a 1-D device
mesh; each device scores queries against its local shard and only tiny
candidate tensors cross ICI:

  1. per-shard top-V video scores -> all-gather (score, global_idx) strips;
     every shard computes the EXACT global top-V by a two-key sort
     (descending score, ascending global video index) — the same tie-break
     as the single-device engine's stable ``lax.top_k``
  2. each shard scores spans only for its local candidates, marks the ones
     inside the exact global top-V set (exactly the reference's "span
     scoring restricted to the global top-V videos", inference.py:346-374),
     and emits its local top-N span candidates with a CANONICAL flat index
     (global-rank * L * W + st * W + band-offset)
  3. the (Nq, k*N) candidate strips concatenate across the mesh; a two-key
     sort (descending score, ascending canonical index) reproduces the
     single-device engine's flat-top-k tie order bit-for-bit given equal
     scores
  4. SVMR probabilities live on the GT video's owning shard; a psum merges
     the one-hot contributions.

Everything inside one shard_map program: compute rides the MXU per shard,
collectives ride ICI, and the host sees a single jitted call.

Exactness note: selection/merge/tie-break logic is exact. Score VALUES can
differ from the single-device engine only by floating-point reduction-order
noise (same einsums over differently-tiled shards); the parity test asserts
full index equality plus allclose scores.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tvretrieval_tpu.models.xml import XML
from tvretrieval_tpu.ops.masking import mask_logits
from tvretrieval_tpu.ops.span import (
    banded_top_spans_from_probs,
    banded_topk_spans,
    topk_stable_blocked,
)


def shard_corpus_cache(cache, mesh: Mesh, cfg=None, chunk_v: int | None = None):
    """Pad the video axis and device_put the cache tensors video-sharded.

    chunk_v defaults to ``cfg.video_chunk_v`` (16 when cfg is None or has
    no such knob) so the sharded cache build honors the same tiling knob as
    the single-chip engine; shard_fn passes the same value to the kernels.

    cfg=None (round-2 behavior): tensors must already be padded to a mesh
    multiple (pad rows carry mask=0).

    cfg given: pads internally — to a mesh multiple, or, when
    ``cfg.video_score_mode == "pallas"``, to a mesh * chunk_v multiple and
    then rebuilds the feat1 streams in the per-shard FLAT video-major
    layout (ops/pallas_score.build_flat_feat1): the flat layout is
    video-major, so a P("data") sharding of the (Nv_pad * lp, D) array
    hands each shard exactly its own videos' rows, and every shard runs
    the round-2 flat-cache kernel locally (one large MXU dot per stream —
    the 3.2x video-score win the sharded path previously left on the
    table). Pad videos are all-masked; the shard program restores their
    exact -1e10 einsum-path score from the mask (see shard_fn), so the
    kernel's mask-free fill is safe here.
    """
    if cache.video_feat1 is not None and cache.video_feat1.ndim == 2:
        raise ValueError(
            "cache holds the FLAT single-chip pallas feat1 layout; pass the "
            "(Nv, L, D) cache and let shard_corpus_cache build the per-shard "
            "flat layout (cfg with video_score_mode='pallas')")
    if cache.feat2_cat is not None and cache.feat2_cat.ndim == 2:
        raise ValueError(
            "cache holds the FLAT single-chip int8 feat2 layout; encode with "
            "span_score_mode='simsweep_cat' and let shard_corpus_cache build "
            "the per-shard flat layout (cfg with span_score_mode="
            "'simsweep_cat_int8_flat')")
    if chunk_v is None:
        chunk_v = getattr(cfg, "video_chunk_v", 16) if cfg is not None else 16
    if cfg is not None:
        pallas = (getattr(cfg, "video_score_mode", "einsum")
                  in ("pallas", "pallas_int8")
                  and cache.video_feat1 is not None
                  and cache.sub_feat1 is not None)
        flat2 = (getattr(cfg, "span_score_mode", "")
                 == "simsweep_cat_int8_flat" and cache.feat2_cat is not None)
        mult = mesh.devices.size * (chunk_v if (pallas or flat2) else 1)
        arrs, _ = pad_videos_to_multiple(
            [cache.video_feat1, cache.video_feat2, cache.sub_feat1,
             cache.sub_feat2, cache.mask, cache.feat2_cat,
             cache.feat2_cat_scale],
            cache.n_videos, mult)
        (cache.video_feat1, cache.video_feat2, cache.sub_feat1,
         cache.sub_feat2, cache.mask, cache.feat2_cat,
         cache.feat2_cat_scale) = arrs
        if pallas:
            from tvretrieval_tpu.ops.pallas_score import (build_flat_feat1,
                                                          quantize_unit_i8)
            # check=False: pad videos are fully masked by construction; the
            # shard program re-masks their scores to the exact einsum value
            cache.video_feat1 = build_flat_feat1(
                cache.video_feat1, cache.mask, chunk_v=chunk_v, check=False)
            cache.sub_feat1 = build_flat_feat1(
                cache.sub_feat1, cache.mask, chunk_v=chunk_v, check=False)
            if getattr(cfg, "video_score_mode", "") == "pallas_int8":
                # halves per-shard feat1 HBM; shard_fn dispatches the s8
                # kernel on the int8 dtype (engine.py "pallas_int8")
                cache.video_feat1 = quantize_unit_i8(cache.video_feat1)
                cache.sub_feat1 = quantize_unit_i8(cache.sub_feat1)
        if flat2:
            # video-major int8 flat feat2 for the per-shard fused Pallas
            # sweep: videos are already padded to a mesh * chunk_v
            # multiple, so the (Nv_pad * lp, 2D) rows split at video
            # boundaries under P("data") and each shard runs the kernel
            # on exactly its own videos (engine.py "simsweep_cat_int8_flat")
            from tvretrieval_tpu.ops.pallas_score import build_flat_feat2_i8
            cache.feat2_cat, cache.feat2_cat_scale = build_flat_feat2_i8(
                cache.feat2_cat, chunk_v=chunk_v)
    sh = NamedSharding(mesh, P("data"))
    put = lambda x: None if x is None else jax.device_put(x, sh)
    cache.video_feat1 = put(cache.video_feat1)
    cache.video_feat2 = put(cache.video_feat2)
    cache.sub_feat1 = put(cache.sub_feat1)
    cache.sub_feat2 = put(cache.sub_feat2)
    cache.mask = put(cache.mask)
    if cache.feat2_cat is not None:
        cache.feat2_cat = put(cache.feat2_cat)
    if cache.feat2_cat_scale is not None:
        cache.feat2_cat_scale = put(cache.feat2_cat_scale)
    return cache


def cat_mode_feat2_args(cache):
    """(video_feat2, sub_feat2) slots for a simsweep_cat cache: feat2_cat
    rides the video_feat2 slot (same video-axis sharding), sub_feat2 gets a
    shardable zero-width placeholder — or, for an int8 cache, the (Nv, L)
    f32 quantization scales (also video-sharded). score_query_batch_sharded
    reinterprets the slots when cfg.span_score_mode startswith
    "simsweep_cat"."""
    nv = cache.feat2_cat.shape[0]
    if cache.feat2_cat_scale is not None:
        return cache.feat2_cat, cache.feat2_cat_scale
    return cache.feat2_cat, jnp.zeros((nv, 1, 0), cache.feat2_cat.dtype)


def pad_videos_to_multiple(arrs, n_videos: int, multiple: int):
    """Zero-pad axis 0 of each array so n_videos % multiple == 0."""
    pad = (-n_videos) % multiple
    if pad == 0:
        return arrs, n_videos
    out = []
    for a in arrs:
        if a is None:
            out.append(None)
        else:
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            out.append(jnp.pad(a, widths))
    return out, n_videos + pad


def _sort_desc_by_score_then_idx(scores, idx, *extras):
    """Two-key sort: descending score, ascending tie-break index — the tie
    order of a stable ``lax.top_k`` over an index-ordered flat array."""
    ops = (-scores, idx) + extras
    out = jax.lax.sort(ops, num_keys=2)
    return (-out[0], out[1]) + tuple(out[2:])


@functools.partial(jax.jit, static_argnames=("model", "cfg", "do_svmr", "mesh"))
def score_query_batch_sharded(model: XML, variables, cfg,
                              query_feat, query_mask,
                              video_feat1, video_feat2, sub_feat1, sub_feat2,
                              ctx_mask, gt_meta_idx, do_svmr: bool, mesh: Mesh):
    """Sharded equivalent of retrieval.engine._score_query_batch."""
    f32 = jnp.float32
    V = cfg.max_vcmr_video
    N = cfg.max_before_nms
    c = model.cfg
    fast = c.merge_two_stream and c.use_video and c.use_sub \
        and c.span_predictor_type == "conv"
    W = cfg.max_pred_l - cfg.min_pred_l

    def shard_fn(vars_, qf, qm, vf1, vf2, sf1, sf2, cmask, gt_idx):
        nv_local = cmask.shape[0]
        shard = jax.lax.axis_index("data")
        base = shard * nv_local
        up = lambda x: None if x is None else x.astype(f32)

        # --- per-shard scoring: mirror the single-device engine's fast path
        # (pre-normalized feat1 cache, gather-then-conv spans) so score
        # values match the unsharded program as closely as fp allows
        if fast:
            vq, sq = model.apply(vars_, qf, qm, method=XML.encode_query)

            def scores_prenormalized(q, feat1_n):
                qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
                s = jnp.einsum("md,nld->mln", qn.astype(feat1_n.dtype), feat1_n,
                               preferred_element_type=jnp.float32)
                return mask_logits(s, cmask.T[None]).max(axis=1)

            if vf1.ndim == 2:
                # per-shard FLAT pallas video scoring (shard_corpus_cache
                # built the video-major flat layout; P("data") hands each
                # shard its own videos' rows). Fully-masked (pad) videos
                # score 0 under the mask-free kernel — restore the exact
                # einsum-path -1e10 from the mask so selection matches.
                from tvretrieval_tpu.ops.masking import NEG_INF
                from tvretrieval_tpu.ops.pallas_score import (
                    flat_lp, quantize_unit_i8, video_scores_pallas_flat,
                    video_scores_pallas_flat_bmax,
                    video_scores_pallas_flat_i8)
                normq = lambda q: q / (jnp.linalg.norm(
                    q, axis=-1, keepdims=True) + 1e-12)
                interp = getattr(cfg, "pallas_interpret", False)
                if vf1.dtype == jnp.int8:
                    qvt = quantize_unit_i8(normq(vq)).T
                    qst = quantize_unit_i8(normq(sq)).T
                else:
                    qvt = normq(vq).astype(vf1.dtype).T
                    qst = normq(sq).astype(sf1.dtype).T
                if getattr(cfg, "video_topk_fused", False):
                    # per-shard fused video-score -> block-max kernel. The
                    # kernel masks only flat-pad rows (>= nv_local) to
                    # -inf; corpus-pad videos (fully-masked rows — by
                    # shard_corpus_cache construction a TRAILING run, so
                    # validity is a prefix) are corrected to the einsum
                    # path's finite NEG_INF OUTSIDE the kernel, and the
                    # one block straddling the valid count is re-maxed
                    # with a single dynamic slice — every other block's
                    # kernel bmax is exact. Selection below then matches
                    # topk_stable_blocked over the corrected scores
                    # bit-for-bit (tests/test_sharded_retrieval.py).
                    scores_pad, bmax = video_scores_pallas_flat_bmax(
                        qvt, qst, vf1, sf1, n_videos=nv_local,
                        lp=flat_lp(cmask.shape[1]),
                        chunk_v=getattr(cfg, "video_chunk_v", 16),
                        interpret=interp)
                    nvp = scores_pad.shape[1]
                    chunk = nvp // bmax.shape[1]
                    n_valid = (cmask.max(axis=1) > 0).sum().astype(jnp.int32)
                    vidx = jnp.arange(nvp, dtype=jnp.int32)
                    scores_pad = jnp.where(
                        (vidx[None] >= n_valid) & (vidx[None] < nv_local),
                        NEG_INF, scores_pad)
                    nb = bmax.shape[1]
                    bend = (jnp.arange(nb, dtype=jnp.int32) + 1) * chunk
                    bstart = bend - chunk
                    bmax = jnp.where(
                        bend[None] <= n_valid, bmax,
                        jnp.where(bstart[None] < nv_local, NEG_INF,
                                  -jnp.inf))
                    b = jnp.minimum(n_valid // chunk, nb - 1)
                    straddle = jax.lax.dynamic_slice(
                        scores_pad, (0, b * chunk),
                        (scores_pad.shape[0], chunk)).max(axis=1)
                    bmax = jax.lax.dynamic_update_slice(
                        bmax, straddle[:, None], (0, b))
                    fused_blocks = (scores_pad, bmax, chunk)
                    q2c = scores_pad[:, :nv_local]
                elif vf1.dtype == jnp.int8:
                    # int8-quantized per-shard flat caches (pallas_int8)
                    fused_blocks = None
                    q2c = video_scores_pallas_flat_i8(
                        qvt, qst, vf1, sf1, n_videos=nv_local,
                        lp=flat_lp(cmask.shape[1]),
                        chunk_v=getattr(cfg, "video_chunk_v", 16),
                        interpret=interp)
                else:
                    fused_blocks = None
                    q2c = video_scores_pallas_flat(
                        qvt, qst, vf1, sf1, n_videos=nv_local,
                        lp=flat_lp(cmask.shape[1]),
                        chunk_v=getattr(cfg, "video_chunk_v", 16),
                        interpret=interp)
                if fused_blocks is None:
                    has_clip = cmask.max(axis=1) > 0              # (nv_local,)
                    q2c = jnp.where(has_clip[None, :], q2c, NEG_INF)
            else:
                fused_blocks = None
                q2c = (scores_prenormalized(vq, vf1)
                       + scores_prenormalized(sq, sf1)) / 2
            q2c_exp = jnp.exp(cfg.q2c_alpha * q2c.astype(f32))
        else:
            fused_blocks = None
            q2c, st_logits_all, ed_logits_all = model.apply(
                vars_, qf, qm, up(vf1), up(vf2), cmask, up(sf1), up(sf2), cmask,
                True, method=XML.get_pred_from_raw_query)
            q2c_exp = jnp.exp(cfg.q2c_alpha * q2c.astype(f32))
            st_probs_all = jax.nn.softmax(st_logits_all.astype(f32), axis=-1)
            ed_probs_all = jax.nn.softmax(ed_logits_all.astype(f32), axis=-1)

        # --- phase 1: global top-V (score desc, global idx asc) — EXACT
        # per-shard selection + exact cross-shard merge by default.
        # topk_stable_blocked is bit-equal to lax.top_k (stable tie order)
        # and ~2x faster over wide video axes. With video_topk_pre_exp the
        # selection/sort run on the raw cosine scores (strictly monotone
        # under exp -> same order) and exp is applied to the V survivors.
        # The fused kernel path selects from its emitted block maxima
        # (pre-exp semantics implied), skipping the separate block-max pass.
        # With video_topk_approx the PER-SHARD selection uses
        # lax.approx_max_k on the pre-exp scores (the single-chip vapprox
        # semantics); the cross-shard merge stays exact, so the global
        # recall is >= the per-shard target — the same A/B contract as the
        # single-chip mode (selected sets can differ from single-chip
        # vapprox, as approximation is per shard row, not per full row).
        vapprox = getattr(cfg, "video_topk_approx", False)
        pre_exp = (getattr(cfg, "video_topk_pre_exp", False)
                   or fused_blocks is not None or vapprox)
        v_local = min(V, nv_local)
        if vapprox:
            # checked BEFORE fused_blocks — same precedence as the
            # single-chip engine (approx > fused)
            top_local_sel, top_local_idx = jax.lax.approx_max_k(
                q2c.astype(f32), v_local,
                recall_target=getattr(cfg, "topk_approx_recall", 0.99))
        elif fused_blocks is not None:
            from tvretrieval_tpu.ops.span import topk_from_block_max
            scores_pad, bmax, chunk = fused_blocks
            top_local_sel, top_local_idx = topk_from_block_max(
                scores_pad, bmax, v_local, block=chunk)
        else:
            sel_scores = q2c.astype(f32) if pre_exp else q2c_exp
            top_local_sel, top_local_idx = topk_stable_blocked(
                sel_scores, v_local)
        top_local = (jnp.exp(cfg.q2c_alpha * top_local_sel) if pre_exp
                     else top_local_sel)                         # (Nq, v_local)
        gidx_local = top_local_idx + base
        all_scores = jax.lax.all_gather(top_local_sel, "data", axis=1, tiled=True)
        all_gidx = jax.lax.all_gather(gidx_local, "data", axis=1, tiled=True)
        topv_scores_g, topv_idx_g = _sort_desc_by_score_then_idx(
            all_scores, all_gidx)
        topv_scores_g = topv_scores_g[:, :V]
        if pre_exp:
            topv_scores_g = jnp.exp(cfg.q2c_alpha * topv_scores_g)
        topv_idx_g = topv_idx_g[:, :V]                               # (Nq, V)

        # local candidates inside the exact global top-V + their global rank
        eq = gidx_local[:, :, None] == topv_idx_g[:, None, :]        # (Nq, vl, V)
        keep = eq.any(axis=-1).astype(f32)
        rank = jnp.argmax(eq, axis=-1).astype(jnp.int32)             # valid iff keep

        # --- phase 2: span probabilities for local candidates (+ GT row)
        if fast:
            gather_idx = (jnp.concatenate([top_local_idx,
                                           jnp.clip(gt_idx - base, 0, nv_local - 1)[:, None]],
                                          axis=1) if do_svmr else top_local_idx)
            mode = getattr(cfg, "span_score_mode", "gather")
            if mode == "simsweep_cat_int8":
                # per-shard INT8 cat sweep: vf2 carries the local int8
                # feat2_cat slice, sf2 the (nv_local, L) f32 row scales
                # (cat_mode_feat2_args). The s8 x s8 -> s32 contraction is
                # integer-exact, so per-shard sim values are IDENTICAL to
                # the single-chip int8 engine (no f32 accumulation-order
                # caveat) — sharded output matches single-device int8
                # bit-for-bit (tests/test_span_score_modes.py).
                st_logits, ed_logits = model.apply(
                    vars_, vq, sq, vf2, sf2, cmask, gather_idx,
                    method=XML.merged_st_ed_scores_simgather_cat_i8)
            elif mode == "simsweep_cat_int8_flat":
                # per-shard fused Pallas int8 sweep: vf2 carries the local
                # video-major flat int8 rows ((nv_local * lp, 2D)), sf2 the
                # (nv_local, lp) f32 row scales. The integer dot + kernel
                # rescale + bf16 store are IDENTICAL to the single-chip
                # flat engine per video, so sharded outputs match the
                # single-device flat mode exactly
                # (tests/test_span_score_modes.py).
                st_logits, ed_logits = model.apply(
                    vars_, vq, sq, vf2, sf2, cmask, gather_idx,
                    interpret=getattr(cfg, "pallas_interpret", False),
                    method=XML.merged_st_ed_scores_pallas_cat_i8)
            elif mode.startswith("simsweep_cat"):
                # per-shard concatenated-cache sweep (one K=2D einsum over
                # the local feat2_cat slice, riding the vf2 slot — see
                # cat_mode_feat2_args) + tiny sim-row gather; _bf16 stores
                # the per-shard similarity bf16 (same single-rounding story
                # as the single-chip engine mode)
                st_logits, ed_logits = model.apply(
                    vars_, vq, sq, vf2, cmask, gather_idx,
                    sim_dtype=(jnp.bfloat16 if mode == "simsweep_cat_bf16"
                               else None),
                    method=XML.merged_st_ed_scores_simgather_cat)
            elif mode == "simsweep":
                # per-shard full-slice similarity sweep (sequential local
                # HBM reads) + tiny sim-row gather — bit-equal to the
                # feature-row gather (tests/test_span_score_modes.py)
                st_logits, ed_logits = model.apply(
                    vars_, vq, vf2, sq, sf2, cmask, gather_idx,
                    method=XML.merged_st_ed_scores_simgather)
            else:
                vf2_g = vf2[gather_idx]                              # (Nq, vl[+1], L, D)
                sf2_g = sf2[gather_idx]
                mask_g = cmask[gather_idx]
                st_logits, ed_logits = model.apply(
                    vars_, vq, vf2_g, sq, sf2_g, mask_g,
                    method=XML.merged_st_ed_scores_gathered)
            st_probs = jax.nn.softmax(st_logits.astype(f32), axis=-1)
            ed_probs = jax.nn.softmax(ed_logits.astype(f32), axis=-1)
            st_top, ed_top = st_probs[:, :v_local], ed_probs[:, :v_local]
        else:
            st_top = jnp.take_along_axis(st_probs_all, top_local_idx[:, :, None], axis=1)
            ed_top = jnp.take_along_axis(ed_probs_all, top_local_idx[:, :, None], axis=1)

        L = st_top.shape[-1]
        n_local = min(N, v_local * L * W)
        topk_mode = getattr(cfg, "span_topk_mode", "grouped")
        if topk_mode == "grouped_shift":
            # hierarchical shift-expansion top-k (bit-equal to the flat
            # banded path, incl. the keep transform — ops/span.py)
            from tvretrieval_tpu.ops.span import banded_topk_spans_grouped_shift
            vid_loc, st_i, ed_i, scores = banded_topk_spans_grouped_shift(
                st_top, ed_top, top_local, cfg.min_pred_l, cfg.max_pred_l,
                n_local, keep_mask=keep)
        elif topk_mode == "grouped_shift8":
            # aligned-8-block gather expansion (bit-equal, incl. keep)
            from tvretrieval_tpu.ops.span import (
                banded_topk_spans_grouped_shift8)
            vid_loc, st_i, ed_i, scores = banded_topk_spans_grouped_shift8(
                st_top, ed_top, top_local, cfg.min_pred_l, cfg.max_pred_l,
                n_local, keep_mask=keep)
        elif topk_mode == "grouped_shift_approx":
            # A/B-contracted approximate selection (engine.RetrievalConfig)
            from tvretrieval_tpu.ops.span import (
                banded_topk_spans_grouped_shift_approx)
            vid_loc, st_i, ed_i, scores = banded_topk_spans_grouped_shift_approx(
                st_top, ed_top, top_local, cfg.min_pred_l, cfg.max_pred_l,
                n_local, keep_mask=keep,
                recall=getattr(cfg, "topk_approx_recall", 0.99))
        else:
            vid_loc, st_i, ed_i, scores = banded_topk_spans(
                st_top, ed_top, top_local, cfg.min_pred_l, cfg.max_pred_l,
                n_local, keep_mask=keep)
        # canonical flat index in the single-device engine's flat ordering:
        # global-rank * L * W + st * W + band offset
        cand_rank = jnp.take_along_axis(rank, vid_loc, axis=1)
        canon = (cand_rank * (L * W) + st_i * W
                 + (ed_i - st_i - cfg.min_pred_l)).astype(jnp.int32)
        vid_global = jnp.take_along_axis(gidx_local, vid_loc, axis=1)

        out = dict(
            topv_scores=topv_scores_g,                # replicated across shards
            topv_idx=topv_idx_g,
            cand_scores=scores, cand_vid=vid_global,
            cand_st=st_i, cand_ed=ed_i, cand_canon=canon,
        )

        if do_svmr:
            # GT probabilities live on one shard; psum the one-hot contribution
            local_gt = gt_idx - base                                  # (Nq,)
            owned = ((local_gt >= 0) & (local_gt < nv_local)).astype(f32)
            if fast:
                st_gt = jax.lax.psum(st_probs[:, v_local] * owned[:, None], "data")
                ed_gt = jax.lax.psum(ed_probs[:, v_local] * owned[:, None], "data")
            else:
                safe = jnp.clip(local_gt, 0, nv_local - 1)
                take = lambda p: jnp.take_along_axis(
                    p, safe[:, None, None], axis=1)[:, 0] * owned[:, None]
                st_gt = jax.lax.psum(take(st_probs_all), "data")      # (Nq, L)
                ed_gt = jax.lax.psum(take(ed_probs_all), "data")
            out.update(svmr_st_probs=st_gt, svmr_ed_probs=ed_gt)
        return out

    specs_in = (P(), P(), P(),
                P("data"), P("data"), P("data"), P("data"), P("data"), P())
    out_specs = dict(
        topv_scores=P(), topv_idx=P(),
        cand_scores=P(None, "data"), cand_vid=P(None, "data"),
        cand_st=P(None, "data"), cand_ed=P(None, "data"),
        cand_canon=P(None, "data"))
    if do_svmr:
        out_specs.update(svmr_st_probs=P(), svmr_ed_probs=P())

    res = shard_map(shard_fn, mesh=mesh, in_specs=specs_in,
                    out_specs=out_specs, check_vma=False)(
        variables, query_feat, query_mask, video_feat1, video_feat2,
        sub_feat1, sub_feat2, ctx_mask, gt_meta_idx)

    # --- global merge (tiny tensors): same (score desc, canonical idx asc)
    # tie order as the single-device flat top-k
    scores, canon, vid, st, ed = _sort_desc_by_score_then_idx(
        res["cand_scores"], res["cand_canon"],
        res["cand_vid"], res["cand_st"], res["cand_ed"])
    out = dict(
        topv_scores=res["topv_scores"], topv_idx=res["topv_idx"],
        vcmr_scores=scores[:, :N], vcmr_vid_global=vid[:, :N],
        vcmr_st=st[:, :N], vcmr_ed=ed[:, :N])

    if do_svmr:
        svmr_st, svmr_ed, svmr_scores = banded_top_spans_from_probs(
            res["svmr_st_probs"], res["svmr_ed_probs"],
            cfg.min_pred_l, cfg.max_pred_l, N)
        out.update(svmr_st=svmr_st, svmr_ed=svmr_ed, svmr_scores=svmr_scores)
    return out

"""Corpus-sharded multi-chip retrieval (SURVEY.md §2.6).

The encoded-corpus cache is sharded over the VIDEO axis of a 1-D device
mesh; each device scores queries against its local shard and only tiny
candidate tensors cross ICI:

  1. per-shard top-V video scores  -> all-gather (Nq, V) per shard, pick the
     global V-th-largest as a per-query threshold
  2. each shard masks local videos below the threshold (exactly the
     reference's "span scoring restricted to the global top-V videos",
     inference.py:346-374) and emits its local top-N span candidates
  3. the (Nq, k*N) candidate strips concatenate across the mesh; a final
     top-N merge yields the same result as the single-device engine
  4. SVMR probabilities live on the GT video's owning shard; a psum merges
     the one-hot contributions.

Everything inside one shard_map program: compute rides the MXU per shard,
collectives ride ICI, and the host sees a single jitted call.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tvretrieval_tpu.models.xml import XML
from tvretrieval_tpu.ops.span import banded_top_spans_from_probs, banded_topk_spans


def shard_corpus_cache(cache, mesh: Mesh):
    """device_put the cache tensors with video-axis sharding. The video count
    must be padded to a multiple of the mesh size (pad rows have mask=0)."""
    sh = NamedSharding(mesh, P("data"))
    put = lambda x: None if x is None else jax.device_put(x, sh)
    cache.video_feat1 = put(cache.video_feat1)
    cache.video_feat2 = put(cache.video_feat2)
    cache.sub_feat1 = put(cache.sub_feat1)
    cache.sub_feat2 = put(cache.sub_feat2)
    cache.mask = put(cache.mask)
    return cache


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


@functools.partial(jax.jit, static_argnames=("model", "cfg", "do_svmr", "mesh"))
def score_query_batch_sharded(model: XML, variables, cfg,
                              query_feat, query_mask,
                              video_feat1, video_feat2, sub_feat1, sub_feat2,
                              ctx_mask, gt_meta_idx, do_svmr: bool, mesh: Mesh):
    """Sharded equivalent of retrieval.engine._score_query_batch."""
    f32 = jnp.float32
    V = cfg.max_vcmr_video
    N = cfg.max_before_nms

    def shard_fn(vars_, qf, qm, vf1, vf2, sf1, sf2, cmask, gt_idx):
        nv_local = cmask.shape[0]
        shard = jax.lax.axis_index("data")
        base = shard * nv_local

        up = lambda x: None if x is None else x.astype(f32)
        q2c, st_logits, ed_logits = model.apply(
            vars_, qf, qm, up(vf1), up(vf2), cmask, up(sf1), up(sf2), cmask,
            True, method=XML.get_pred_from_raw_query)        # (Nq, nv_local), (Nq, nv_local, L)
        q2c_exp = jnp.exp(cfg.q2c_alpha * q2c.astype(f32))
        st_probs = jax.nn.softmax(st_logits.astype(f32), axis=-1)
        ed_probs = jax.nn.softmax(ed_logits.astype(f32), axis=-1)
        L = st_probs.shape[-1]

        # --- phase 1: global top-V threshold over video scores
        v_local = min(V, nv_local)
        top_local, top_local_idx = jax.lax.top_k(q2c_exp, v_local)   # (Nq, v_local)
        all_top = jax.lax.all_gather(top_local, "data", axis=1, tiled=True)  # (Nq, k*v_local)
        thresh = jax.lax.top_k(all_top, V)[0][:, -1]                 # (Nq,) V-th largest

        # --- phase 2: local spans restricted to globally-top videos
        keep = top_local >= thresh[:, None]                          # (Nq, v_local)
        kept_scores = jnp.where(keep, top_local, 0.0)
        st_top = jnp.take_along_axis(st_probs, top_local_idx[:, :, None], axis=1)
        ed_top = jnp.take_along_axis(ed_probs, top_local_idx[:, :, None], axis=1)
        W = cfg.max_pred_l - cfg.min_pred_l
        n_local = min(N, v_local * L * W)
        vid_loc, st_i, ed_i, scores = banded_topk_spans(
            st_top, ed_top, kept_scores, cfg.min_pred_l, cfg.max_pred_l, n_local)
        vid_global = jnp.take_along_axis(top_local_idx, vid_loc, axis=1) + base

        out = dict(
            topv_scores=top_local,
            topv_idx=top_local_idx + base,
            cand_scores=scores, cand_vid=vid_global,
            cand_st=st_i, cand_ed=ed_i,
        )

        if do_svmr:
            # GT probabilities live on one shard; psum the one-hot contribution
            local_gt = gt_idx - base                                  # (Nq,)
            owned = (local_gt >= 0) & (local_gt < nv_local)
            safe = jnp.clip(local_gt, 0, nv_local - 1)
            take = lambda p: jnp.take_along_axis(
                p, safe[:, None, None], axis=1)[:, 0] * owned[:, None]
            st_gt = jax.lax.psum(take(st_probs), "data")              # (Nq, L)
            ed_gt = jax.lax.psum(take(ed_probs), "data")
            out.update(svmr_st_probs=st_gt, svmr_ed_probs=ed_gt)
        return out

    specs_in = (P(), P(), P(),
                P("data"), P("data"), P("data"), P("data"), P("data"), P())
    out_specs = dict(
        topv_scores=P(None, "data"), topv_idx=P(None, "data"),
        cand_scores=P(None, "data"), cand_vid=P(None, "data"),
        cand_st=P(None, "data"), cand_ed=P(None, "data"))
    if do_svmr:
        out_specs.update(svmr_st_probs=P(), svmr_ed_probs=P())

    res = shard_map(shard_fn, mesh=mesh, in_specs=specs_in,
                    out_specs=out_specs, check_vma=False)(
        variables, query_feat, query_mask, video_feat1, video_feat2,
        sub_feat1, sub_feat2, ctx_mask, gt_meta_idx)

    # --- global merges (tiny tensors)
    topv_scores, sel = jax.lax.top_k(res["topv_scores"], V)
    topv_idx = jnp.take_along_axis(res["topv_idx"], sel, axis=1)

    cand_scores, sel = jax.lax.top_k(res["cand_scores"], N)
    take = lambda x: jnp.take_along_axis(x, sel, axis=1)
    out = dict(
        topv_scores=topv_scores, topv_idx=topv_idx,
        vcmr_scores=cand_scores, vcmr_vid_global=take(res["cand_vid"]),
        vcmr_st=take(res["cand_st"]), vcmr_ed=take(res["cand_ed"]))

    if do_svmr:
        svmr_st, svmr_ed, svmr_scores = banded_top_spans_from_probs(
            res["svmr_st_probs"], res["svmr_ed_probs"],
            cfg.min_pred_l, cfg.max_pred_l, N)
        out.update(svmr_st=svmr_st, svmr_ed=svmr_ed, svmr_scores=svmr_scores)
    return out

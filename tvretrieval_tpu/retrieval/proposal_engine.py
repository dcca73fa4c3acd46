"""CAL/MCN proposal-based corpus retrieval engine.

Reference: clip_alignment_with_language/inference.py:52-185 + 377-500. The
reference Python-loops over 21.8K videos encoding proposals and computing
cdist per video (the profiled hot spot, SURVEY.md §3E). TPU re-design:

  * a proposal's mean squared-L2 distance decomposes as
        mean_c ||q - m_c||^2 = |q|^2 - 2 q . mean_c(m_c) + mean_c(|m_c|^2)
    so per proposal we cache only (mean_embedding, mean_sqnorm): the whole
    corpus collapses to a (N_videos * max_props, D_o) matrix and query
    scoring is ONE MXU matmul + rank-1 terms, instead of 21.8K host-loop
    cdist calls.
  * proposals are generated host-side per video (cached by duration) and
    padded to a static max_props; padded slots get +1e10 distance.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tvretrieval_tpu.data.datasets import CorpusIndex
from tvretrieval_tpu.data.proposals import get_proposal_interface
from tvretrieval_tpu.data.retrieval_datasets import CALExampleBuilder
from tvretrieval_tpu.models.cal import CALWithSub


@dataclass
class ProposalCorpusCache:
    mean_emb_video: Optional[jnp.ndarray]   # (Nv, P, Do)
    mean_sq_video: Optional[jnp.ndarray]    # (Nv, P)
    mean_emb_sub: Optional[jnp.ndarray]
    mean_sq_sub: Optional[jnp.ndarray]
    prop_mask: jnp.ndarray                  # (Nv, P)
    prop_spans: np.ndarray                  # (Nv, P, 2) seconds, host-side
    n_videos: int


@functools.partial(jax.jit, static_argnames=("model",))
def _encode_proposal_batch(model: CALWithSub, variables, vfeat, sfeat, cmask):
    """vfeat/sfeat: (B, P, C, D); cmask: (B, P, C) ->
    per-stream (mean_emb (B,P,Do), mean_sq (B,P))."""
    c = model.cfg

    def one(feat, stream):
        emb = model.apply(variables, feat, stream, method=CALWithSub.encode_moments)
        denom = jnp.maximum(cmask.sum(-1), 1.0)                  # (B, P)
        mean_emb = (emb * cmask[..., None]).sum(-2) / denom[..., None]
        mean_sq = (jnp.sum(emb ** 2, -1) * cmask).sum(-1) / denom
        return mean_emb, mean_sq

    ev = one(vfeat, "video") if (c.use_video or c.use_tef_only) else (None, None)
    es = one(sfeat, "sub") if c.use_sub else (None, None)
    return ev[0], ev[1], es[0], es[1]


@functools.partial(jax.jit, static_argnames=("model", "topk"))
def _score_proposals(model: CALWithSub, variables, query_feat, query_mask,
                     cache_tuple, topk: int):
    """Top-k smallest distances over all (video, proposal) pairs."""
    mean_v, sq_v, mean_s, sq_s, prop_mask = cache_tuple
    q = model.apply(variables, query_feat, query_mask,
                    method=CALWithSub.encode_query)              # (Nq, Do)
    c = model.cfg
    n_streams = int(c.use_video or c.use_tef_only) + int(c.use_sub)

    def dist(mean_emb, mean_sq):
        nv, p, do = mean_emb.shape
        flat = mean_emb.reshape(nv * p, do)
        qsq = jnp.sum(q ** 2, -1)[:, None]
        d = qsq - 2 * jnp.einsum("qd,pd->qp", q, flat,
                                 preferred_element_type=jnp.float32) \
            + mean_sq.reshape(-1)[None]
        return d                                                  # (Nq, Nv*P)

    d = 0
    if c.use_video or c.use_tef_only:
        d = d + dist(mean_v, sq_v)
    if c.use_sub:
        d = d + dist(mean_s, sq_s)
    d = d / n_streams
    d = d + (1.0 - prop_mask.reshape(-1)[None]) * 1e10            # mask pads
    from tvretrieval_tpu.ops.span import topk_stable_blocked
    neg_top, idx = topk_stable_blocked(-d, topk)   # bit-equal to lax.top_k
    return -neg_top, idx, d


def encode_proposal_corpus(model: CALWithSub, variables,
                           builder: CALExampleBuilder, corpus: CorpusIndex,
                           dset_name: str = "tvr", max_props: Optional[int] = None,
                           ctx_bsz: int = 32) -> ProposalCorpusCache:
    proposer = get_proposal_interface(dset_name)
    all_props = [proposer(d) for d in corpus.durations]
    P = max_props or max(len(p) for p in all_props)

    spans = np.zeros((len(corpus), P, 2), np.float32)
    mean_v, sq_v, mean_s, sq_s, masks = [], [], [], [], []
    n = len(corpus)
    bsz = min(ctx_bsz, n)
    for i in range(0, n, bsz):
        idxs = list(range(i, min(i + bsz, n)))
        pad = bsz - len(idxs)
        idxs = idxs + [idxs[-1]] * pad
        vf, sf, cm, pm = [], [], [], []
        for j in idxs:
            props = all_props[j][:P]
            spans[j, : len(props)] = props
            v, s, c, p = builder.build_proposal_batch(
                corpus.vid_names[j], corpus.durations[j], props, P)
            vf.append(v); sf.append(s); cm.append(c); pm.append(p)
        mv, qv, ms, qs = _encode_proposal_batch(
            model, variables, jnp.asarray(np.stack(vf)),
            jnp.asarray(np.stack(sf)), jnp.asarray(np.stack(cm)))
        keep = bsz - pad
        if mv is not None:
            mean_v.append(mv[:keep]); sq_v.append(qv[:keep])
        if ms is not None:
            mean_s.append(ms[:keep]); sq_s.append(qs[:keep])
        masks.append(jnp.asarray(np.stack(pm))[:keep])

    cat = lambda xs: jnp.concatenate(xs) if xs else None
    return ProposalCorpusCache(
        mean_emb_video=cat(mean_v), mean_sq_video=cat(sq_v),
        mean_emb_sub=cat(mean_s), mean_sq_sub=cat(sq_s),
        prop_mask=jnp.concatenate(masks), prop_spans=spans, n_videos=n)


def save_proposal_cache(cache: ProposalCorpusCache, path: str) -> None:
    """Persist the encoded proposal corpus (reference --use_intermediate
    caching, clip_alignment_with_language/inference.py:534-545): a crashed
    or repeated inference resumes without re-encoding 21.8K videos."""
    arrays = {"prop_mask": np.asarray(cache.prop_mask),
              "prop_spans": cache.prop_spans,
              "n_videos": np.asarray(cache.n_videos)}
    for key in ("mean_emb_video", "mean_sq_video", "mean_emb_sub", "mean_sq_sub"):
        val = getattr(cache, key)
        if val is not None:
            arrays[key] = np.asarray(val)
    np.savez_compressed(path, **arrays)


def load_proposal_cache(path: str) -> ProposalCorpusCache:
    z = np.load(path, allow_pickle=False)
    maybe = lambda k: jnp.asarray(z[k]) if k in z.files else None
    return ProposalCorpusCache(
        mean_emb_video=maybe("mean_emb_video"), mean_sq_video=maybe("mean_sq_video"),
        mean_emb_sub=maybe("mean_emb_sub"), mean_sq_sub=maybe("mean_sq_sub"),
        prop_mask=jnp.asarray(z["prop_mask"]), prop_spans=z["prop_spans"],
        n_videos=int(z["n_videos"]))


def cal_retrieve(model: CALWithSub, variables, builder: CALExampleBuilder,
                 cache: ProposalCorpusCache, corpus: CorpusIndex,
                 query_rows: List[dict], tasks: Sequence[str] = ("VCMR", "SVMR"),
                 query_bsz: int = 100, max_before_nms: int = 200,
                 return_arrays: bool = False):
    """VCMR: flat top-k smallest distance over (video, proposal); SVMR:
    rank proposals of the GT video (reference :377-500). Scores reported as
    negative distances (larger = better), like the reference.

    return_arrays: row-aligned numpy arrays {(vid, spans, scores)} for
    eval_retrieval_arrays — the per-epoch eval path skips dict building."""
    P = cache.prop_spans.shape[1]
    meta_video_idx = np.asarray([corpus.video2idx[v] for v in corpus.vid_names])
    vid2meta = {v: i for i, v in enumerate(corpus.vid_names)}
    cache_tuple = (cache.mean_emb_video, cache.mean_sq_video,
                   cache.mean_emb_sub, cache.mean_sq_sub, cache.prop_mask)

    top_ds, top_idxs, svmr_chunks = [], [], []
    bsz = min(query_bsz, len(query_rows))
    topk = min(max_before_nms, cache.n_videos * P)
    do_svmr = "SVMR" in tasks
    for i in range(0, len(query_rows), bsz):
        rows = query_rows[i:i + bsz]
        pad = bsz - len(rows)
        qb = builder.build_query_batch(rows + [rows[-1]] * pad)
        top_d, top_idx, full_d = _score_proposals(
            model, variables, jnp.asarray(qb["query_feat"]),
            jnp.asarray(qb["query_mask"]), cache_tuple, topk)
        top_ds.append(np.asarray(top_d)[: len(rows)])
        top_idxs.append(np.asarray(top_idx)[: len(rows)])
        if do_svmr:
            fd = np.asarray(full_d)[: len(rows)].reshape(
                len(rows), cache.n_videos, P)
            gt = np.asarray([vid2meta.get(r.get("vid_name"), 0) for r in rows])
            svmr_chunks.append(fd[np.arange(len(rows)), gt])      # (B, P)

    # vectorized conversion (one pass, no per-query python)
    top_d = np.concatenate(top_ds, axis=0)
    top_idx = np.concatenate(top_idxs, axis=0)
    v_meta, p_idx = top_idx // P, top_idx % P
    vcmr_vid = meta_video_idx[v_meta]                             # (Nq, K)
    vcmr_spans = cache.prop_spans[v_meta, p_idx]                  # (Nq, K, 2)
    vcmr_scores = -top_d

    if do_svmr:
        sd = np.concatenate(svmr_chunks, axis=0)                  # (Nq, P)
        k2 = min(max_before_nms, P)
        order = np.argsort(sd, axis=1)[:, :k2]
        gt_meta = np.asarray([vid2meta.get(r.get("vid_name"), 0)
                              for r in query_rows])
        svmr_vid = np.broadcast_to(meta_video_idx[gt_meta][:, None], order.shape)
        svmr_spans = cache.prop_spans[gt_meta[:, None], order]
        svmr_scores = -np.take_along_axis(sd, order, axis=1)

    if return_arrays:
        out = {}
        if "VCMR" in tasks:
            out["VCMR"] = (vcmr_vid, vcmr_spans, vcmr_scores)
        if do_svmr:
            out["SVMR"] = (svmr_vid, svmr_spans, svmr_scores)
        return out

    vcmr_res, svmr_res = [], []
    for qi, row in enumerate(query_rows):
        head = dict(desc_id=row["desc_id"], desc=row.get("desc", ""))
        if "VCMR" in tasks:
            vcmr_res.append({**head, "predictions": [
                [int(v), float(s0), float(s1), float(sc)] for v, (s0, s1), sc
                in zip(vcmr_vid[qi], vcmr_spans[qi], vcmr_scores[qi])]})
        if do_svmr and row.get("vid_name") in vid2meta:
            svmr_res.append({**head, "predictions": [
                [int(v), float(s0), float(s1), float(sc)] for v, (s0, s1), sc
                in zip(svmr_vid[qi], svmr_spans[qi], svmr_scores[qi])]})

    out = {}
    if vcmr_res:
        out["VCMR"] = vcmr_res
    if svmr_res:
        out["SVMR"] = svmr_res
    return out

"""MEE video-retrieval (VR) corpus engine.

Reference: mixture_embedding_experts/inference.py:25-104 — encode every
video once with the gated embedding units, pool + encode each query batch,
score the full corpus with the MoE-fused similarity, top-k videos.
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from tvretrieval_tpu.data.datasets import CorpusIndex
from tvretrieval_tpu.data.retrieval_datasets import MEEExampleBuilder
from tvretrieval_tpu.models.mee import MEE


@functools.partial(jax.jit, static_argnames=("model",))
def _encode_ctx(model: MEE, variables, video_feat, sub_feat):
    return model.apply(variables, video_feat, sub_feat, False,
                       method=MEE.encode_context)


@functools.partial(jax.jit, static_argnames=("model", "topk"))
def _score_queries(model: MEE, variables, query_feat, enc_video, enc_sub,
                   topk: int):
    pooled = model.apply(variables, query_feat, False, method=MEE.pool_query)
    scores = model.apply(variables, pooled, enc_video, enc_sub, False,
                         method=MEE.scores)                    # (Nq, Nv)
    # bit-equal to lax.top_k, block-max pruned (ops/span.py; the win grows
    # with corpus width — the reference's 1M-video MEE ambition)
    from tvretrieval_tpu.ops.span import topk_stable_blocked
    top_scores, top_idx = topk_stable_blocked(scores.astype(jnp.float32), topk)
    return top_scores, top_idx


def mee_retrieve_vr(model: MEE, variables, builder: MEEExampleBuilder,
                    corpus: CorpusIndex, query_rows: List[dict],
                    ctx_bsz: int = 400, query_bsz: int = 100,
                    topk: int = 100, return_arrays: bool = False):
    """Returns {"VR": [...]} submission entries, or with
    ``return_arrays=True`` the row-aligned (Nq, topk) video-idx and score
    arrays for eval_retrieval_arrays (per-epoch eval skips dict building)."""
    topk = min(topk, len(corpus))
    # encode corpus
    enc_v, enc_s = [], []
    n = len(corpus)
    bsz = min(ctx_bsz, n)
    for i in range(0, n, bsz):
        names = corpus.vid_names[i:i + bsz]
        pad = bsz - len(names)
        if pad:
            names = names + [names[-1]] * pad
        batch = builder.build_context_batch(names)
        ev, es = _encode_ctx(model, variables,
                             jnp.asarray(batch["video_feat"]),
                             jnp.asarray(batch["sub_feat"]))
        keep = bsz - pad
        if ev is not None:
            enc_v.append(ev[:keep])
        if es is not None:
            enc_s.append(es[:keep])
    enc_v = jnp.concatenate(enc_v) if enc_v else None
    enc_s = jnp.concatenate(enc_s) if enc_s else None

    meta_video_idx = np.asarray([corpus.video2idx[v] for v in corpus.vid_names])

    all_scores, all_vid = [], []
    bsz = min(query_bsz, len(query_rows))
    for i in range(0, len(query_rows), bsz):
        rows = query_rows[i:i + bsz]
        pad = bsz - len(rows)
        qb = builder.build_query_batch(rows + [rows[-1]] * pad)
        scores, idx = _score_queries(model, variables,
                                     jnp.asarray(qb["query_feat"]),
                                     enc_v, enc_s, topk)
        all_scores.append(np.asarray(scores)[: len(rows)])
        all_vid.append(meta_video_idx[np.asarray(idx)[: len(rows)]])
    scores = np.concatenate(all_scores, axis=0)
    vid_idx = np.concatenate(all_vid, axis=0)
    if return_arrays:
        return {"VR": (vid_idx, scores)}
    vr_res = [{
        "desc_id": row["desc_id"], "desc": row.get("desc", ""),
        "predictions": [[int(v), 0, 0, float(s)]
                        for v, s in zip(vid_idx[qi], scores[qi])],
    } for qi, row in enumerate(query_rows)]
    return {"VR": vr_res}

"""ExCL inference engines.

SVMR (reference excl/inference.py:31-75): span probabilities on the GT
video, joint (st, ed) product under the min/max-length mask, top spans.

VCMR via external VR (reference excl/inference_with_vcmr.py:40-103): ExCL is
early-fusion so it cannot pre-encode a corpus; for each query the top-N
videos of an external VR submission are re-encoded WITH the query, st probs
are scaled by exp(alpha * vr_score), and spans from all N videos are merged
by score. (Deviation from the reference: we convert clip indices to seconds
in the predictions; the reference emits raw clip indices there, which its
own evaluator would mis-score.)
"""
from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tvretrieval_tpu.data.datasets import CorpusIndex, ExampleBuilder
from tvretrieval_tpu.models.excl import ExCL
from tvretrieval_tpu.ops.span import min_max_length_mask, top_spans_from_probs
from tvretrieval_tpu.utils.io import load_json


@functools.partial(jax.jit, static_argnames=("model", "top_n", "min_l", "max_l"))
def _svmr_spans(model: ExCL, variables, query_feat, query_mask, video_feat,
                video_mask, sub_feat, sub_mask, top_n: int, min_l: int, max_l: int):
    st, ed = model.apply(variables, query_feat, query_mask, video_feat,
                         video_mask, sub_feat, sub_mask,
                         method=ExCL.span_logits)
    st_p = jax.nn.softmax(st.astype(jnp.float32), axis=-1)
    ed_p = jax.nn.softmax(ed.astype(jnp.float32), axis=-1)
    lm = jnp.asarray(min_max_length_mask(st_p.shape[-1], min_l, max_l))
    return top_spans_from_probs(st_p, ed_p, lm, top_n), (st_p, ed_p)


def excl_retrieve_svmr(model: ExCL, variables, builder: ExampleBuilder,
                       corpus: CorpusIndex, query_rows: List[dict],
                       clip_length: float = 1.5, query_bsz: int = 50,
                       min_pred_l: int = 2, max_pred_l: int = 16,
                       max_before_nms: int = 200) -> Dict[str, list]:
    svmr_res = []
    bsz = min(query_bsz, len(query_rows))
    for i in range(0, len(query_rows), bsz):
        rows = query_rows[i:i + bsz]
        pad = bsz - len(rows)
        b = builder.build_train_batch(rows + [rows[-1]] * pad, eval_labels=True)
        (st_i, ed_i, scores), _ = _svmr_spans(
            model, variables, jnp.asarray(b.query_feat), jnp.asarray(b.query_mask),
            jnp.asarray(b.video_feat), jnp.asarray(b.video_mask),
            jnp.asarray(b.sub_feat), jnp.asarray(b.sub_mask),
            max_before_nms, min_pred_l, max_pred_l)
        st_i, ed_i, scores = (np.asarray(st_i)[: len(rows)],
                              np.asarray(ed_i)[: len(rows)],
                              np.asarray(scores)[: len(rows)])
        for qi, row in enumerate(rows):
            vid_idx = corpus.video2idx[row["vid_name"]]
            preds = [[vid_idx, float(s * clip_length),
                      float((e + 1) * clip_length), float(sc)]
                     for s, e, sc in zip(st_i[qi], ed_i[qi], scores[qi])]
            svmr_res.append({"desc_id": row["desc_id"],
                             "desc": row.get("desc", ""), "predictions": preds})
    return {"SVMR": svmr_res}


@functools.partial(jax.jit, static_argnames=(
    "model", "q2c_alpha", "min_l", "max_l", "top_n"))
def _external_vr_spans(model: ExCL, variables, query_feat, query_mask,
                       video_feat, video_mask, sub_feat, sub_mask, vr_scores,
                       q2c_alpha: float, min_l: int, max_l: int, top_n: int):
    st, ed = model.apply(variables, query_feat, query_mask, video_feat,
                         video_mask, sub_feat, sub_mask,
                         method=ExCL.span_logits)
    st_p = jax.nn.softmax(st.astype(jnp.float32), axis=-1)
    ed_p = jax.nn.softmax(ed.astype(jnp.float32), axis=-1)
    st_p = st_p * jnp.exp(q2c_alpha * vr_scores)[:, None]
    lm = jnp.asarray(min_max_length_mask(st_p.shape[-1], min_l, max_l))
    return top_spans_from_probs(st_p, ed_p, lm, top_n)


def load_external_vr_with_scores(path: str, top_n: int = 100) -> Dict[int, list]:
    """{desc_id: [(vid_idx, score), ...]} from a VR submission JSON."""
    sub = load_json(path)
    return {e["desc_id"]: [(p[0], p[3]) for p in e["predictions"][:top_n]]
            for e in sub["VR"]}


def excl_retrieve_vcmr_with_external_vr(
        model: ExCL, variables, builder: ExampleBuilder, corpus: CorpusIndex,
        query_rows: List[dict], external_vr_path: str,
        clip_length: float = 1.5, top_n_videos: int = 100,
        q2c_alpha: float = 20.0, min_pred_l: int = 2, max_pred_l: int = 16,
        top_n_per_video: int = 50, max_before_nms: int = 200) -> Dict[str, list]:
    external = load_external_vr_with_scores(external_vr_path, top_n_videos)
    idx2video = {v: k for k, v in corpus.video2idx.items()}
    dur = dict(zip(corpus.vid_names, corpus.durations))

    def _score(query_feat, query_mask, video_feat, video_mask, sub_feat,
               sub_mask, vr_scores):
        return _external_vr_spans(
            model, variables, query_feat, query_mask, video_feat, video_mask,
            sub_feat, sub_mask, vr_scores, q2c_alpha, min_pred_l, max_pred_l,
            top_n_per_video)

    vcmr_res = []
    for row in query_rows:
        cands = external.get(row["desc_id"], [])[:top_n_videos]
        if not cands:
            vcmr_res.append({"desc_id": row["desc_id"],
                             "desc": row.get("desc", ""), "predictions": []})
            continue
        names = [idx2video[v] for v, _ in cands]
        scores = np.asarray([s for _, s in cands], np.float32)
        ctx = builder.build_context_batch(names, [dur[n] for n in names])
        qf, qm = builder.query(row["desc_id"])
        n = len(names)
        st_i, ed_i, span_scores = _score(
            jnp.asarray(np.broadcast_to(qf, (n,) + qf.shape).copy()),
            jnp.asarray(np.broadcast_to(qm, (n,) + qm.shape).copy()),
            jnp.asarray(ctx.video_feat), jnp.asarray(ctx.video_mask),
            jnp.asarray(ctx.sub_feat), jnp.asarray(ctx.sub_mask),
            jnp.asarray(scores))
        st_i, ed_i, span_scores = map(np.asarray, (st_i, ed_i, span_scores))
        preds = []
        for vi, (vid_idx, _) in enumerate(cands):
            preds.extend(
                [vid_idx, float(s * clip_length), float((e + 1) * clip_length),
                 float(sc)]
                for s, e, sc in zip(st_i[vi], ed_i[vi], span_scores[vi]))
        preds.sort(key=lambda r: r[3], reverse=True)
        vcmr_res.append({"desc_id": row["desc_id"],
                         "desc": row.get("desc", ""),
                         "predictions": preds[:max_before_nms]})
    return {"VCMR": vcmr_res}

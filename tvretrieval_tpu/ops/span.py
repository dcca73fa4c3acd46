"""Span scoring ops: min/max-length masks and on-device top-k span extraction.

The reference does the joint start-end scoring with host numpy sorts
(inference.py:378-386, tensor_utils.py:115-141). Here everything runs on
device: the (st, ed) outer product is masked with a static upper-triangular
band and reduced with ``jax.lax.top_k``; the host only receives the final
top-N indices/scores.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def min_max_length_mask(length: int, min_l: int, max_l: int) -> np.ndarray:
    """(L, L) float mask; (st, ed) valid iff min_l <= ed - st < max_l.

    Matches reference generate_min_max_length_mask (inference.py:170-192):
    triu(k=min_l) * (1 - triu(k=max_l)). Static — precompute on host.
    """
    ones = np.ones((length, length), dtype=np.float32)
    return np.triu(ones, k=min_l) * (1.0 - np.triu(ones, k=max_l))


@partial(jax.jit, static_argnames=("top_n",))
def top_spans_from_probs(st_probs: jnp.ndarray, ed_probs: jnp.ndarray,
                         length_mask: jnp.ndarray, top_n: int):
    """Top-N (st, ed) pairs by st_prob * ed_prob under a length mask.

    Args:
        st_probs / ed_probs: (N, L)
        length_mask: (L, L) static validity mask (see min_max_length_mask)
        top_n: number of spans returned per row

    Returns:
        st_idx, ed_idx: (N, top_n) int32; scores: (N, top_n) float32,
        sorted descending. On-device replacement for the reference's
        find_max_triples_from_upper_triangle_product (tensor_utils.py:115).
    """
    n, L = st_probs.shape
    joint = st_probs[:, :, None] * ed_probs[:, None, :] * length_mask[None]
    flat = joint.reshape(n, L * L)
    scores, idx = jax.lax.top_k(flat, top_n)
    return (idx // L).astype(jnp.int32), (idx % L).astype(jnp.int32), scores


@partial(jax.jit, static_argnames=("top_n",))
def flat_topk_spans(joint_scores: jnp.ndarray, top_n: int):
    """Top-N over (N_q, V, L, L) joint scores, flattened over (V, L, L).

    Returns (video_local_idx, st_idx, ed_idx, scores), each (N_q, top_n) —
    the on-device version of the reference's flat sort + np.unravel_index
    (inference.py:378-386, 423-431).
    """
    n_q, v, L, _ = joint_scores.shape
    flat = joint_scores.reshape(n_q, v * L * L)
    scores, idx = jax.lax.top_k(flat, top_n)
    vid = idx // (L * L)
    rem = idx % (L * L)
    return vid.astype(jnp.int32), (rem // L).astype(jnp.int32), (rem % L).astype(jnp.int32), scores

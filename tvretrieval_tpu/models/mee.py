"""MEE — Mixture of Embedding Experts (video-retrieval baseline), TPU-native.

Reference: baselines/mixture_embedding_experts/model.py + model_components.py:
NetVLAD query pooling (2 clusters), Gated Embedding Units per stream,
learned MoE weights fusing the per-stream similarity matrices, and the
bidirectional max-margin ranking loss over the in-batch confusion matrix.

BatchNorm (inside NetVLAD and ContextGating) uses flax nn.BatchNorm with a
"batch_stats" collection — train with mutable=["batch_stats"], eval with
use_running_average=True.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn

from tvretrieval_tpu.models.components import _normal_init


@dataclass(frozen=True)
class MEEConfig:
    ctx_mode: str = "video_sub"
    text_input_size: int = 768
    vid_input_size: int = 3072
    output_size: int = 256
    margin: float = 0.2
    dtype_str: str = "float32"

    @property
    def use_video(self) -> bool:
        return "video" in self.ctx_mode

    @property
    def use_sub(self) -> bool:
        return "sub" in self.ctx_mode

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32


def _l2norm(x, axis=-1, eps=1e-12):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


class NetVLAD(nn.Module):
    """(reference model_components.py:61-103)"""

    cluster_size: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        n, L, D = x.shape
        init = nn.initializers.normal(stddev=D ** -0.5)
        clusters = self.param("clusters", init, (D, self.cluster_size))
        clusters2 = self.param("clusters2", init, (1, D, self.cluster_size))

        flat = x.reshape(-1, D)
        assignment = flat @ clusters                                  # (NL, K)
        assignment = nn.BatchNorm(use_running_average=not train,
                                  name="bn")(assignment)
        assignment = nn.softmax(assignment, axis=1).reshape(n, L, self.cluster_size)

        a_sum = assignment.sum(axis=1, keepdims=True)                 # (N, 1, K)
        a = a_sum * clusters2                                         # (N, D, K)
        vlad = jnp.einsum("nlk,nld->nkd", assignment, x)              # (N, K, D)
        vlad = vlad.transpose(0, 2, 1) - a                            # (N, D, K)
        vlad = _l2norm(vlad, axis=1)                                  # intra-norm
        vlad = vlad.reshape(n, -1)
        return _l2norm(vlad)


class ContextGating(nn.Module):
    """x * sigmoid(BN(Wx)) — glu over concat (reference :21-35)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x1 = nn.Dense(x.shape[-1], kernel_init=_normal_init(), dtype=self.dtype)(x)
        x1 = nn.BatchNorm(use_running_average=not train, name="bn")(x1)
        return x * nn.sigmoid(x1)


class GatedEmbeddingUnit(nn.Module):
    """Dense -> ContextGating -> L2 norm (reference :7-18)."""

    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.output_dim, kernel_init=_normal_init(), dtype=self.dtype)(x)
        x = ContextGating(self.dtype)(x, train=train)
        return _l2norm(x)


def max_margin_ranking_loss(scores: jnp.ndarray, margin: float) -> jnp.ndarray:
    """Bidirectional max-margin over the (N, N) confusion matrix
    (reference MaxMarginRankingLoss :38-58): mean over all (pos, other)
    pairs of relu(margin - pos + other), both row-wise and column-wise."""
    n = scores.shape[0]
    diag = jnp.diag(scores)
    row = nn.relu(margin - diag[:, None] + scores)   # query -> all videos
    col = nn.relu(margin - diag[None, :] + scores)   # video -> all queries
    return (row.mean() + col.mean()) / 2


class MEE(nn.Module):
    cfg: MEEConfig

    def setup(self):
        c = self.cfg
        self.query_pooling = NetVLAD(cluster_size=2, dtype=c.dtype)
        if c.use_sub:
            self.sub_query_gu = GatedEmbeddingUnit(c.output_size, c.dtype)
            self.sub_gu = GatedEmbeddingUnit(c.output_size, c.dtype)
        if c.use_video:
            self.video_query_gu = GatedEmbeddingUnit(c.output_size, c.dtype)
            self.video_gu = GatedEmbeddingUnit(c.output_size, c.dtype)
        if c.use_video and c.use_sub:
            self.moe_fc = nn.Dense(2, kernel_init=_normal_init(), dtype=c.dtype)

    def encode_context(self, video_feat, sub_feat, train: bool = False):
        """video_feat/sub_feat: (N, D) mean-pooled video-level features."""
        c = self.cfg
        ev = self.video_gu(video_feat, train=train) if c.use_video else None
        es = self.sub_gu(sub_feat, train=train) if c.use_sub else None
        return ev, es

    def pool_query(self, query_feat, train: bool = False):
        return self.query_pooling(query_feat, train=train)

    def scores(self, pooled_query, encoded_video, encoded_sub, train: bool = False):
        """(Nq, Nc) fused similarity (reference model.py:64-83)."""
        c = self.cfg
        v = (self.video_query_gu(pooled_query, train=train) @ encoded_video.T
             if c.use_video else 0)
        s = (self.sub_query_gu(pooled_query, train=train) @ encoded_sub.T
             if c.use_sub else 0)
        if c.use_video and c.use_sub:
            w = self.moe_fc(pooled_query)                 # (Nq, 2)
            return w[:, 0:1] * v + w[:, 1:2] * s
        return v + s

    def __call__(self, query_feat, query_mask, video_feat, sub_feat,
                 train: bool = True):
        pooled = self.pool_query(query_feat, train=train)
        ev, es = self.encode_context(video_feat, sub_feat, train=train)
        confusion = self.scores(pooled, ev, es, train=train)
        return max_margin_ranking_loss(confusion.astype(jnp.float32),
                                       self.cfg.margin)

"""CAL / MCN — proposal-based moment retrieval baseline, TPU-native.

Reference: baselines/clip_alignment_with_language/model.py (CALWithSub:136).
Per-stream MLP moment encoders (L2-normalized), a unidirectional-LSTM query
encoder, mean squared-L2 clip distance per proposal, and triplet losses with
intra-video + inter-video negatives. ``model_type="mcn"`` mean-pools the
clips inside a proposal before encoding (handled by the data layer feeding
one pooled "clip" per proposal).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn

from tvretrieval_tpu.models.components import _normal_init
from tvretrieval_tpu.models.rnn import RNNEncoder


@dataclass(frozen=True)
class CALConfig:
    ctx_mode: str = "video_sub"
    visual_input_size: int = 3074 * 2 + 2   # [local; global; TEF] concat
    textual_input_size: int = 770 * 2
    query_feat_size: int = 768
    visual_hidden_size: int = 500
    output_size: int = 100
    lstm_hidden_size: int = 1000
    margin: float = 0.1
    loss_type: str = "hinge"
    inter_loss_weight: float = 0.4
    dtype_str: str = "float32"

    @property
    def use_video(self) -> bool:
        return "video" in self.ctx_mode

    @property
    def use_sub(self) -> bool:
        return "sub" in self.ctx_mode

    @property
    def use_tef_only(self) -> bool:
        return "tef" in self.ctx_mode and not (self.use_video or self.use_sub)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32


def _l2norm(x, eps=1e-12):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


class MomentMLP(nn.Module):
    """Dense -> ReLU -> Dense, then L2 norm (reference model.py:146-150)."""

    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=_normal_init(), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.out, kernel_init=_normal_init(), dtype=self.dtype)(x)
        return _l2norm(x)


class CALWithSub(nn.Module):
    cfg: CALConfig

    def setup(self):
        c = self.cfg
        if c.use_video or c.use_tef_only:
            self.video_moment_mlp = MomentMLP(c.visual_hidden_size, c.output_size, c.dtype)
        if c.use_sub:
            self.sub_moment_mlp = MomentMLP(c.visual_hidden_size, c.output_size, c.dtype)
        self.query_lstm = RNNEncoder(c.lstm_hidden_size, "lstm",
                                     bidirectional=False, dtype=c.dtype)
        self.query_linear = nn.Dense(c.output_size, kernel_init=_normal_init(),
                                     dtype=c.dtype)

    # ----------------------------------------------------------------- encode
    def encode_query(self, query_feat, query_mask):
        _, hidden = self.query_lstm(query_feat, query_mask.sum(axis=1))
        return _l2norm(self.query_linear(hidden))                     # (N, Do)

    def encode_moments(self, moment_feat, stream: str):
        mlp = getattr(self, f"{stream}_moment_mlp")
        return mlp(moment_feat)                                       # (..., Lc, Do)

    # -------------------------------------------------------------- distances
    def _pdist(self, query_embed, moment_feat, moment_mask, stream):
        """Mean squared-L2 distance over a proposal's clips (model.py:186-196)."""
        emb = self.encode_moments(moment_feat, stream)                # (N, Lc, Do)
        d = jnp.sum((emb - query_embed[:, None, :]) ** 2, axis=-1)    # (N, Lc)
        return (d * moment_mask).sum(axis=1) / jnp.maximum(moment_mask.sum(axis=1), 1.0)

    def compute_pdist(self, query_embed, video_feat, sub_feat, moment_mask):
        c = self.cfg
        n = int(c.use_video or c.use_tef_only) + int(c.use_sub)
        dv = (self._pdist(query_embed, video_feat, moment_mask, "video")
              if c.use_video or c.use_tef_only else 0)
        ds = (self._pdist(query_embed, sub_feat, moment_mask, "sub")
              if c.use_sub else 0)
        return (dv + ds) / n

    def cdist_from_encoded(self, query_embeds, video_moment_emb, sub_moment_emb,
                           moment_mask):
        """All queries x all proposals (reference compute_cdist_inference
        :213-245), with pre-encoded proposal embeddings.

        query_embeds: (Nq, Do); *_moment_emb: (Np, Lc, Do); mask: (Np, Lc).
        """
        c = self.cfg
        n = int(c.use_video or c.use_tef_only) + int(c.use_sub)

        def one(emb):
            # ||q - m||^2 = |q|^2 - 2 q.m + |m|^2 — MXU matmul + rank-1 terms
            q2 = jnp.sum(query_embeds ** 2, axis=-1)[:, None, None]   # (Nq,1,1)
            m2 = jnp.sum(emb ** 2, axis=-1)[None]                     # (1,Np,Lc)
            qm = jnp.einsum("qd,pld->qpl", query_embeds, emb,
                            preferred_element_type=jnp.float32)
            d = q2 - 2 * qm + m2                                      # (Nq,Np,Lc)
            denom = jnp.maximum(moment_mask.sum(axis=1), 1.0)[None]
            return (d * moment_mask[None]).sum(axis=-1) / denom       # (Nq,Np)

        dv = one(video_moment_emb) if c.use_video or c.use_tef_only else 0
        ds = one(sub_moment_emb) if c.use_sub else 0
        return (dv + ds) / n

    # ------------------------------------------------------------------ train
    def _rank_loss(self, pos_dist, neg_dist):
        c = self.cfg
        if c.loss_type == "hinge":
            return nn.relu(c.margin + pos_dist - neg_dist).mean()
        if c.loss_type == "lse":
            return jnp.log1p(jnp.exp(pos_dist - neg_dist)).mean()
        raise NotImplementedError(c.loss_type)

    def __call__(self, query_feat, query_mask,
                 pos_video_feat, pos_sub_feat, pos_mask,
                 intra_video_feat, intra_sub_feat, intra_mask,
                 inter_video_feat, inter_sub_feat, inter_mask):
        """Triplet loss: pos vs intra-video negative + weighted inter-video
        negative (reference forward :247-286)."""
        q = self.encode_query(query_feat, query_mask)
        pos = self.compute_pdist(q, pos_video_feat, pos_sub_feat, pos_mask)
        intra = self.compute_pdist(q, intra_video_feat, intra_sub_feat, intra_mask)
        loss = self._rank_loss(pos, intra)
        if self.cfg.inter_loss_weight != 0:
            inter = self.compute_pdist(q, inter_video_feat, inter_sub_feat, inter_mask)
            loss = loss + self.cfg.inter_loss_weight * self._rank_loss(pos, inter)
        return loss, {"loss_overall": loss}

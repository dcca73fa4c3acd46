"""ExCL — Extractive Clip Localization (SVMR baseline), TPU-native.

Reference: baselines/excl/model.py:21-165. Bidirectional-LSTM query encoder
pooled to a single vector, two stacked context LSTMs per stream with the
query vector concatenated between them, and MLP(tanh) start/end predictors
over [ctx2; ctx1; query]. Cross-entropy span loss only (SVMR task).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from tvretrieval_tpu.models.components import _normal_init
from tvretrieval_tpu.models.rnn import RNNEncoder
from tvretrieval_tpu.models.xml import _cross_entropy
from tvretrieval_tpu.ops.masking import mask_logits


@dataclass(frozen=True)
class ExCLConfig:
    ctx_mode: str = "video_sub"
    visual_input_size: int = 3074
    sub_input_size: int = 770
    query_input_size: int = 768
    hidden_size: int = 256
    drop: float = 0.5
    initializer_range: float = 0.02
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


class SpanPredictor(nn.Module):
    """Linear -> tanh -> Linear(1) (reference excl/model.py:57-60)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, kernel_init=_normal_init(), dtype=self.dtype)(x)
        x = jnp.tanh(x)
        return nn.Dense(1, kernel_init=_normal_init(), dtype=self.dtype)(x)[..., 0]


class ExCL(nn.Module):
    cfg: ExCLConfig

    def setup(self):
        c = self.cfg
        h = c.hidden_size // 2
        self.dropout = nn.Dropout(c.drop)
        self.query_encoder = RNNEncoder(h, "lstm", True, c.dtype)
        if c.use_video:
            self.video_encoder = RNNEncoder(h, "lstm", True, c.dtype)
            self.video_encoder2 = RNNEncoder(h, "lstm", True, c.dtype)
            self.video_st_predictor = SpanPredictor(c.hidden_size, c.dtype)
            self.video_ed_predictor = SpanPredictor(c.hidden_size, c.dtype)
        if c.use_sub:
            self.sub_encoder = RNNEncoder(h, "lstm", True, c.dtype)
            self.sub_encoder2 = RNNEncoder(h, "lstm", True, c.dtype)
            self.sub_st_predictor = SpanPredictor(c.hidden_size, c.dtype)
            self.sub_ed_predictor = SpanPredictor(c.hidden_size, c.dtype)

    def _single_stream(self, encoded_query, ctx_feat, ctx_mask, stream,
                       deterministic):
        """(reference get_prob_single_stream, excl/model.py:110-123)"""
        lengths = ctx_mask.sum(axis=1).astype(jnp.int32)
        drop = lambda x: self.dropout(x, deterministic=deterministic)
        ctx1, _ = getattr(self, f"{stream}_encoder")(drop(ctx_feat), lengths)
        ctx2, _ = getattr(self, f"{stream}_encoder2")(
            drop(jnp.concatenate([ctx1, encoded_query], axis=-1)), lengths)
        feat3 = jnp.concatenate([ctx2, ctx1, encoded_query], axis=-1)
        st = getattr(self, f"{stream}_st_predictor")(feat3)
        ed = getattr(self, f"{stream}_ed_predictor")(feat3)
        return mask_logits(st, ctx_mask), mask_logits(ed, ctx_mask)

    def span_logits(self, query_feat, query_mask, video_feat, video_mask,
                    sub_feat, sub_mask, deterministic: bool = True):
        """(st_logits, ed_logits), each (N, Lc)."""
        c = self.cfg
        q_lengths = query_mask.sum(axis=1).astype(jnp.int32)
        _, q_hidden = self.query_encoder(query_feat, q_lengths)      # (N, D)
        Lc = (video_feat if c.use_video else sub_feat).shape[1]
        q_rep = jnp.broadcast_to(q_hidden[:, None, :],
                                 (q_hidden.shape[0], Lc, q_hidden.shape[-1]))
        vst, ved = (self._single_stream(q_rep, video_feat, video_mask, "video",
                                        deterministic) if c.use_video else (0, 0))
        sst, sed = (self._single_stream(q_rep, sub_feat, sub_mask, "sub",
                                        deterministic) if c.use_sub else (0, 0))
        n = int(c.use_video) + int(c.use_sub)
        return (vst + sst) / n, (ved + sed) / n

    def __call__(self, query_feat, query_mask, video_feat, video_mask,
                 sub_feat, sub_mask, st_ed_indices, deterministic: bool = False):
        st, ed = self.span_logits(query_feat, query_mask, video_feat, video_mask,
                                  sub_feat, sub_mask, deterministic)
        loss = (_cross_entropy(st.astype(jnp.float32), st_ed_indices[:, 0])
                + _cross_entropy(ed.astype(jnp.float32), st_ed_indices[:, 1]))
        return loss, {"loss_st_ed": loss}

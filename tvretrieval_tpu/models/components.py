"""Shared neural blocks (flax.linen), TPU-first.

Capability parity with reference model_components.py: BERT-style
self/cross-attention (BertSelfAttention:244, BertAttention:201), residual
output blocks (BertSelfOutput:306), LN+dropout+linear input projections
(LinearLayer:141), trainable and sinusoidal positional encodings
(TrainablePositionalEncoding:67, PositionEncoding:92), and the
depthwise-separable ConvEncoder (:51). Re-designed as pure functional flax
modules: masks are float {0,1} tensors, attention masking is additive
(1-m)*-1e4 exactly like the reference (model_components.py:277), and all
matmuls carry ``preferred_element_type=float32`` so the MXU accumulates in
fp32 even under bf16 inputs.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torch nn.LayerNorm epsilon; flax default is 1e-6
LN_EPS = 1e-5


def _normal_init(std: float = 0.02):
    return nn.initializers.normal(stddev=std)


class LinearLayer(nn.Module):
    """Optional LayerNorm -> dropout -> dense -> optional ReLU
    (reference model_components.py:141-163)."""

    out_dim: int
    layer_norm: bool = True
    dropout: float = 0.1
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, kernel_init=_normal_init(), dtype=self.dtype, name="dense")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class TrainablePositionalEncoding(nn.Module):
    """x + learned positional embedding, then LN + dropout
    (reference model_components.py:67-89)."""

    max_len: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        dim = x.shape[-1]
        pos = self.param("pos_embed", _normal_init(), (self.max_len, dim))
        L = x.shape[-2]
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln")(x + pos[:L])
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


def sinusoidal_position_encoding(length: int, dim: int) -> np.ndarray:
    """Static cosine PE table (reference PositionEncoding:105-125)."""
    position = np.arange(length, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float32) * -(math.log(10000.0) / dim))
    pe = np.zeros((length, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term[: pe[:, 1::2].shape[1]])
    return pe


class BertSelfAttention(nn.Module):
    """Multi-head attention over separate q/k/v inputs with a float mask.

    Mask shape broadcastable to (N, Lq, Lk); masked scores get
    ``(1 - mask) * -1e4`` added (reference model_components.py:266-303).
    Used both as self-attention (q=k=v) and cross-attention between the
    video and subtitle streams (model_xml.py:349-354).
    """

    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 mask: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        dim = q.shape[-1]
        if dim % self.num_heads:
            raise ValueError(f"hidden size {dim} not divisible by {self.num_heads} heads")
        head_dim = dim // self.num_heads

        def proj(x, name):
            y = nn.Dense(dim, kernel_init=_normal_init(), dtype=self.dtype, name=name)(x)
            return y.reshape(y.shape[:-1] + (self.num_heads, head_dim))

        qh = proj(q, "query")  # (N, Lq, H, dh)
        kh = proj(k, "key")
        vh = proj(v, "value")

        scores = jnp.einsum("nqhd,nkhd->nhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(head_dim)
        if mask.ndim == 2:  # (N, Lk) -> broadcast over queries
            mask = mask[:, None, :]
        scores = scores + (1.0 - mask[:, None, :, :].astype(scores.dtype)) * -1e4
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("nhqk,nkhd->nqhd", probs.astype(self.dtype), vh,
                         preferred_element_type=jnp.float32)
        return ctx.reshape(ctx.shape[:2] + (dim,)).astype(self.dtype)


class BertSelfOutput(nn.Module):
    """dense -> dropout -> LN(x + residual) (reference :306-317)."""

    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, residual: jnp.ndarray,
                 *, deterministic: bool = True) -> jnp.ndarray:
        hidden = nn.Dense(hidden.shape[-1], kernel_init=_normal_init(),
                          dtype=self.dtype, name="dense")(hidden)
        hidden = nn.Dropout(self.dropout)(hidden, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln")(hidden + residual)


class BertAttention(nn.Module):
    """Self-attention + residual output block — the XML "encoder layer"
    (reference model_components.py:201-216; XML uses it without an FFN)."""

    num_heads: int
    att_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 *, deterministic: bool = True) -> jnp.ndarray:
        att = BertSelfAttention(self.num_heads, self.att_dropout, self.dtype,
                                name="self")(x, x, x, mask, deterministic=deterministic)
        return BertSelfOutput(self.hidden_dropout, self.dtype, name="output")(
            att, x, deterministic=deterministic)


class DepthwiseSeparableConv(nn.Module):
    """1-D depthwise conv (k) + pointwise conv (1x1) + optional ReLU
    (reference model_components.py:7-48), operating on (N, L, D)."""

    kernel_size: int
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        x = nn.Conv(features=dim, kernel_size=(self.kernel_size,), padding="SAME",
                    feature_group_count=dim, dtype=self.dtype, name="depthwise")(x)
        x = nn.Conv(features=dim, kernel_size=(1,), dtype=self.dtype, name="pointwise")(x)
        return nn.relu(x) if self.relu else x


class ConvEncoder(nn.Module):
    """LN(dropout(conv(x)) + x) (reference model_components.py:51-64)."""

    kernel_size: int = 7
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        y = DepthwiseSeparableConv(self.kernel_size, dtype=self.dtype, name="conv")(x)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln")(y + x)


class Conv1dSame(nn.Module):
    """Single-channel 1-D conv over (N, L) rows, stride 1, zero 'SAME'
    padding, no bias — the ConvSE start/end predictor primitive
    (reference model_xml.py:95-100, 162-165)."""

    kernel_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = float(self.kernel_size)
        bound = 1.0 / math.sqrt(fan_in)
        init = nn.initializers.uniform(scale=2 * bound)

        def shifted_init(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - bound  # uniform(-bound, bound)

        orig_shape = x.shape
        y = x.reshape(-1, orig_shape[-1])[..., None]  # (rows, L, 1)
        y = nn.Conv(features=1, kernel_size=(self.kernel_size,), padding="SAME",
                    use_bias=False, kernel_init=shifted_init, dtype=self.dtype,
                    name="conv")(y)
        return y[..., 0].reshape(orig_shape)

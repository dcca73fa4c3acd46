"""Masked (bi)directional RNN encoder via lax.scan-backed flax cells.

Capability parity with reference utils/model_utils.py:10-72 (RNNEncoder):
variable-length sequences, LSTM/GRU, bidirectional concat, final hidden at
each sequence's true end. The reference sorts + packs for cuDNN; on TPU the
masked-scan formulation (flax nn.RNN with seq_lengths) is the native
equivalent — no sorting, static shapes, and the backward direction flips
only the valid prefix (same semantics as pack_padded_sequence).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


class RNNEncoder(nn.Module):
    """Returns (outputs (N, L, dirs*H), final_hidden (N, dirs*H)).

    Outputs at positions >= length are zeroed (pad_packed_sequence parity).
    """

    hidden_size: int             # per direction
    rnn_type: str = "lstm"       # "lstm" | "gru"
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32

    def _cell(self, name: str):
        if self.rnn_type == "lstm":
            return nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype, name=name)
        if self.rnn_type == "gru":
            return nn.GRUCell(self.hidden_size, dtype=self.dtype, name=name)
        raise NotImplementedError(self.rnn_type)

    @staticmethod
    def _final_hidden(carry):
        # LSTM carry = (c, h); GRU carry = h
        return carry[1] if isinstance(carry, tuple) else carry

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lengths = lengths.astype(jnp.int32)
        fwd = nn.RNN(self._cell("fwd_cell"), return_carry=True, name="fwd")
        carry_f, out_f = fwd(x, seq_lengths=lengths)
        outs = [out_f]
        hiddens = [self._final_hidden(carry_f)]
        if self.bidirectional:
            bwd = nn.RNN(self._cell("bwd_cell"), return_carry=True, reverse=True,
                         keep_order=True, name="bwd")
            carry_b, out_b = bwd(x, seq_lengths=lengths)
            outs.append(out_b)
            hiddens.append(self._final_hidden(carry_b))
        outputs = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        # zero positions beyond each length (reference pad_packed zero-pads)
        L = x.shape[1]
        mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(outputs.dtype)
        outputs = outputs * mask[:, :, None]
        hidden = jnp.concatenate(hiddens, axis=-1) if len(hiddens) > 1 else hiddens[0]
        return outputs, hidden


def max_pool_masked(outputs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Max over valid time steps (reference pool_across_time, model_utils.py:75)."""
    neg = (1.0 - mask)[:, :, None] * -1e10
    return (outputs + neg).max(axis=1)


def mean_pool_masked(outputs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    return (outputs * mask[:, :, None]).sum(axis=1) / denom

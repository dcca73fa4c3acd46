"""Masking primitives shared across models."""
from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e10


def mask_logits(target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """``target * mask + (1 - mask) * -1e10``.

    Same convention as reference model_xml.py:640-641: mask is float {0,1},
    masked positions become -1e10 so downstream max / softmax ignore them.
    """
    return target * mask + (1.0 - mask) * NEG_INF

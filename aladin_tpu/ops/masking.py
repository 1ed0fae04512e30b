"""Length -> mask helpers.

The reference builds boolean padding masks with Python loops over per-sample
length lists (ref:alad/alad_model.py:153-161, ref:alad/loss.py:103-116).
Under XLA everything is static-shaped: lengths travel as int32 device arrays
and masks are derived with ``iota < len`` broadcasting, so one compiled
program serves every batch.

Convention: ``True`` marks a VALID position (the reference uses True=padding
for torch ``src_key_padding_mask``; we invert at the point of use and name
things explicitly to avoid sign bugs).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def valid_mask(lengths: Array, max_len: int) -> Array:
    """(B,) int lengths -> (B, max_len) bool, True where position < length."""
    pos = jnp.arange(max_len, dtype=jnp.int32)
    return pos[None, :] < lengths[:, None].astype(jnp.int32)


def padding_mask(lengths: Array, max_len: int) -> Array:
    """True where position is padding (torch ``src_key_padding_mask`` sense)."""
    return ~valid_mask(lengths, max_len)


def additive_attention_bias(mask_1d: Array, dtype=jnp.float32, neg: float = -10000.0) -> Array:
    """1/0 attention mask -> additive bias, broadcastable to (B, H, Q, K).

    Reproduces the OSCAR backbone's ``(1 - mask) * -10000`` extended mask
    (ref:oscar/modeling/modeling_bert.py:213-226). Accepts a (B, K) 1-D mask
    or a (B, Q, K) 2-D block mask and inserts the head axis.
    """
    m = mask_1d.astype(dtype)
    if m.ndim == 2:  # (B, K) -> (B, 1, 1, K)
        m = m[:, None, None, :]
    elif m.ndim == 3:  # (B, Q, K) -> (B, 1, Q, K)
        m = m[:, None, :, :]
    else:
        raise ValueError(f"attention mask must be 2-D or 3-D, got {m.ndim}-D")
    return (1.0 - m) * neg

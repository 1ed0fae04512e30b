"""Attention-score aggregation modules.

Equivalent capability to ref:alad/attention_aggregation.py (NOTE: dead code
in the reference - imported nowhere - but part of the component inventory,
SURVEY.md S2.1): scaled-dot-product attention pooling that collapses each
modality's token set to one vector, optionally multi-headed, plus the
self-aggregation wrapper pairing the two modalities.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array


class ScoreDotProductAttention(nn.Module):
    """Attention of a learned query over the token set -> one pooled vector
    (ref:attention_aggregation.py:7-47 capability)."""

    d_model: int
    temperature: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, padding_mask: Optional[Array] = None) -> Array:
        temp = self.temperature or self.d_model**0.5
        q = self.param("query", nn.initializers.normal(0.02), (self.d_model,))
        scores = jnp.einsum("bsd,d->bs", x, q.astype(x.dtype)) / temp
        if padding_mask is not None:
            scores = jnp.where(padding_mask, -jnp.inf, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bs,bsd->bd", attn, x)


class MultiHeadAttentionAggregation(nn.Module):
    """n_head pooled views concatenated and projected back to d_model
    (ref:attention_aggregation.py:50-79 capability)."""

    d_model: int
    n_head: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, padding_mask: Optional[Array] = None) -> Array:
        heads = [
            ScoreDotProductAttention(self.d_model, dtype=self.dtype, name=f"head_{i}")(
                x, padding_mask
            )
            for i in range(self.n_head)
        ]
        cat = jnp.concatenate(heads, axis=-1)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(cat)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(out)


class SelfAggregation(nn.Module):
    """Aggregate both modalities to single vectors
    (ref:attention_aggregation.py:82-129 capability)."""

    d_model: int
    n_head: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_set: Array, cap_seq: Array,
                 img_pad: Optional[Array] = None, cap_pad: Optional[Array] = None
                 ) -> Tuple[Array, Array]:
        agg_i = MultiHeadAttentionAggregation(self.d_model, self.n_head, self.dtype,
                                              name="img_aggregation")
        agg_c = MultiHeadAttentionAggregation(self.d_model, self.n_head, self.dtype,
                                              name="cap_aggregation")
        return agg_i(img_set, img_pad), agg_c(cap_seq, cap_pad)

"""Head-side building blocks: torch-semantics transformer encoder, depth
aggregation, feature fusion, pooling aggregators, positional encodings.

The reference builds its heads from torch ``nn.TransformerEncoder`` (post-LN,
ReLU feed-forward, LayerNorm eps 1e-5, packed-QKV MultiheadAttention) and a
small zoo of aggregators (ref:alad/alad_model.py:84-117,
ref:alad/utils.py:7-239). These are re-implemented here with identical math
in batch-first layout.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import Array


class TorchMultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention semantics (self-attention case).

    Packed in-projection (one (3E, E) weight + (3E,) bias upstream; stored
    here as q/k/v Dense for clean sharding - the checkpoint converter splits
    the packed tensor), scaled dot-product, key-padding mask, attention-prob
    dropout, out projection.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, key_padding_mask: Optional[Array], deterministic: bool) -> Array:
        e, h = self.embed_dim, self.num_heads
        d = e // h
        q = nn.Dense(e, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(e, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(e, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(*x.shape[:-1], h, d)
        k = k.reshape(*x.shape[:-1], h, d)
        v = v.reshape(*x.shape[:-1], h, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(d, jnp.float32))
        if key_padding_mask is not None:  # True = padding (torch convention)
            neg = jnp.asarray(-jnp.inf, scores.dtype)
            scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(*x.shape[:-1], e)
        return nn.Dense(e, dtype=self.dtype, name="out_proj")(ctx)


class TorchTransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer (the pre-1.9, post-LN default):
    x = LN1(x + drop(SelfAttn(x))); x = LN2(x + drop(W2 drop(relu(W1 x)))).
    LayerNorm eps 1e-5 (torch default, distinct from BERT's 1e-12)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, key_padding_mask: Optional[Array], deterministic: bool) -> Array:
        attn = TorchMultiheadAttention(
            self.d_model, self.nhead, self.dropout, self.dtype, name="self_attn"
        )(x, key_padding_mask, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        ff = nn.Dropout(self.dropout)(jax.nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(
            x + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        )
        return x


class TorchTransformerEncoder(nn.Module):
    """Stack of TorchTransformerEncoderLayer (no final norm, matching
    nn.TransformerEncoder(norm=None))."""

    num_layers: int
    d_model: int
    nhead: int = 4
    dim_feedforward: Optional[int] = None
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, key_padding_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        ff = self.dim_feedforward or self.d_model
        for i in range(self.num_layers):
            x = TorchTransformerEncoderLayer(
                self.d_model, self.nhead, ff, self.dropout, self.dtype, name=f"layer_{i}"
            )(x, key_padding_mask, deterministic)
        return x


class DepthAggregator(nn.Module):
    """Aggregate the (depth, B, S, D) hidden-state stack over depth
    (ref:alad/utils.py:7-49). Modes: None -> last layer; 'mean'; 'gated' ->
    per-(token, depth) sigmoid gates from a self-attention pass."""

    aggr: Optional[str]
    input_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, padding_mask: Array, deterministic: bool = True) -> Array:
        if not self.aggr:
            return x[-1]
        if self.aggr == "mean":
            return x.mean(axis=0)
        if self.aggr == "gated":
            depth, b, s, dim = x.shape
            flat = x.reshape(depth * b, s, dim)
            mask = jnp.tile(padding_mask[None, :, :], (depth, 1, 1)).reshape(depth * b, s)
            sa = TorchMultiheadAttention(self.input_dim, 4, 0.1, self.dtype, name="self_attn")(
                flat, mask, deterministic
            )
            gate = jax.nn.sigmoid(nn.Dense(1, dtype=self.dtype, name="gate_ffn")(sa))
            gate = gate.reshape(depth, b, s, 1)
            # out[b, s, :] = sum_depth gate * x  (ref:alad/utils.py:36-39)
            return jnp.einsum("dbsi,dbsk->bsk", gate, x, preferred_element_type=jnp.float32).astype(
                x.dtype
            )
        if self.aggr == "transformer":
            # The reference constructs a 1-layer depth transformer for this
            # mode (nn.TransformerEncoderLayer(d_model=hidden, nhead=4,
            # dim_feedforward=hidden), ref:alad_model.py:97-99) but its
            # aggregator forward never handles it -> UnboundLocalError
            # (latent defect, ref:alad/utils.py:15-49). Completed here with
            # the evident intent: per (sample, token), the depth axis is the
            # sequence a 1-layer TE attends over; the LAST depth position's
            # output is the aggregate (the analogue of aggr=None taking
            # x[-1], now context-mixed across depth).
            depth, b, s, dim = x.shape
            seq = x.transpose(1, 2, 0, 3).reshape(b * s, depth, dim)
            out = TorchTransformerEncoder(
                1, self.input_dim, nhead=4, dim_feedforward=self.input_dim,
                dtype=self.dtype, name="depth_transformer",
            )(seq, None, deterministic)
            return out[:, -1, :].reshape(b, s, dim)
        raise ValueError(f"unknown depth aggregation {self.aggr!r}")


class FeatureFusion(nn.Module):
    """Learned 2-way weighted fusion (ref:alad/utils.py:217-239)."""

    feat_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: Array, b: Array, deterministic: bool = True) -> Array:
        cat = jnp.concatenate([a, b], axis=-1)
        h = nn.Dense(512, dtype=self.dtype, name="fc1")(cat)
        h = nn.Dropout(0.1)(jax.nn.relu(h), deterministic=deterministic)
        alphas = jax.nn.sigmoid(nn.Dense(2, dtype=self.dtype, name="fc2")(h))
        return a * alphas[..., 0:1] + b * alphas[..., 1:2]


class GatedAggregation(nn.Module):
    """Sigmoid-gated sum pooling over tokens (ref:alad/utils.py:142-164).
    Note the reference masks the gate logits to -inf (sigmoid -> 0) so padded
    tokens contribute nothing."""

    feat_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, padding_mask: Array) -> Array:
        g = nn.Dense(self.feat_dim, dtype=self.dtype, name="gate_fc1")(x)
        g = nn.Dense(1, dtype=self.dtype, name="gate_fc2")(jax.nn.relu(g))
        g = jnp.where(padding_mask[..., None], -jnp.inf, g)
        m = jax.nn.sigmoid(g)
        v = nn.Dense(self.feat_dim, dtype=self.dtype, name="node_fc1")(x)
        v = nn.Dense(self.feat_dim, dtype=self.dtype, name="node_fc2")(jax.nn.relu(v))
        return jnp.einsum("bs,bsd->bd", m[..., 0], v, preferred_element_type=jnp.float32).astype(
            x.dtype
        )


class Aggregator(nn.Module):
    """Sequence -> vector pooling (ref:alad/utils.py:167-205). Modes:
    'first' (token 0, the shipped default), 'sum', 'gated', 'sum-and-map',
    'gru' (a scanned GRU reading the masked sequence; final hidden state -
    pack_padded_sequence semantics with static shapes)."""

    embed_size: int
    aggregation: str = "first"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, lengths: Array, padding_mask: Array) -> Array:
        if self.aggregation == "first":
            return x[:, 0, :]
        if self.aggregation in ("sum", "sum-and-map"):
            out = jnp.sum(jnp.where(padding_mask[..., None], 0.0, x), axis=1)
            if self.aggregation == "sum-and-map":
                out = nn.Dense(self.embed_size, dtype=self.dtype, name="map_fc1")(out)
                out = nn.Dense(self.embed_size, dtype=self.dtype, name="map_fc2")(jax.nn.relu(out))
            return out
        if self.aggregation == "gated":
            return GatedAggregation(self.embed_size, self.dtype, name="gated")(x, padding_mask)
        if self.aggregation == "gru":
            rnn = nn.RNN(nn.GRUCell(self.embed_size, dtype=self.dtype), name="gru")
            carry, _ = rnn(
                x, seq_lengths=lengths.astype(jnp.int32), return_carry=True
            )
            return carry
        raise ValueError(f"unsupported aggregation {self.aggregation!r}")


def sinusoidal_positions(max_len: int, d_model: int) -> jnp.ndarray:
    """Sin/cos table (ref:alad/utils.py:52-68)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


class PositionalEncodingText(nn.Module):
    """Additive sinusoidal positions + dropout (ref:alad/utils.py:52-68)."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        pe = sinusoidal_positions(self.max_len, self.d_model)
        x = x + pe[None, : x.shape[1], :]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class PositionalEncodingImageGrid(nn.Module):
    """Grid-coordinate positional signal for n x n region grids
    (ref:alad/utils.py:71-103): each cell's (x, y) in [-1, 1] projected by a
    learned Linear and added; an optional leading start token gets an
    off-grid coordinate."""

    d_model: int
    n_regions: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, start_token: bool = False) -> Array:
        n = self.n_regions
        coords = jnp.linspace(-1.0, 1.0, n)
        grid = jnp.stack(
            [jnp.tile(coords[None, :], (n, 1)), jnp.tile(coords[:, None], (1, n))], axis=2
        ).reshape(n * n, 2)
        proj = nn.Dense(self.d_model, dtype=self.dtype, name="map")
        pe = proj(grid)  # (n*n, d)
        if start_token:
            off = jnp.asarray([[-1.0 - 2.0 / n, -1.0]], x.dtype)
            pe0 = proj(off)  # (1, d)
            return jnp.concatenate(
                [x[:, :1] + pe0[None], x[:, 1:] + pe[None, : x.shape[1] - 1]], axis=1
            )
        return x + pe[None, : x.shape[1]]


class PositionalEncodingImageBoxes(nn.Module):
    """Box geometry -> positional signal (ref:alad/utils.py:106-131).
    mode 'project-and-sum': Linear([x1,y1,x2,y2,area]) added to features;
    mode 'concat-and-process': MLP over [features ; geometry]."""

    d_model: int
    mode: str = "project-and-sum"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, boxes: Array) -> Array:
        area = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
        s = jnp.concatenate([boxes, area[..., None]], axis=-1)
        if self.mode == "project-and-sum":
            return x + nn.Dense(self.d_model, dtype=self.dtype, name="map")(s)
        if self.mode == "concat-and-process":
            h = jnp.concatenate([x, s], axis=-1)
            h = nn.Dense(self.d_model, dtype=self.dtype, name="map_fc1")(h)
            return nn.Dense(self.d_model, dtype=self.dtype, name="map_fc2")(jax.nn.relu(h))
        raise ValueError(self.mode)

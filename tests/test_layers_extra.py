"""Tests for the long-tail layer modules: attention aggregation, grid/box
positional encodings, GRU aggregator, AdamW+warmup-linear helpers."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aladin_tpu.models.attention_aggregation import (
    MultiHeadAttentionAggregation,
    ScoreDotProductAttention,
    SelfAggregation,
)
from aladin_tpu.models.layers import (
    Aggregator,
    PositionalEncodingImageBoxes,
    PositionalEncodingImageGrid,
    PositionalEncodingText,
    sinusoidal_positions,
)
from aladin_tpu.train.schedule import make_adamw, warmup_linear_schedule


def test_score_attention_pooling(rng):
    m = ScoreDotProductAttention(8)
    x = jnp.array(rng.randn(2, 5, 8).astype(np.float32))
    pad = jnp.array([[False] * 5, [False, False, True, True, True]])
    params = m.init(jax.random.PRNGKey(0), x, pad)
    out = m.apply(params, x, pad)
    assert out.shape == (2, 8)
    # padded tokens cannot influence the pooled vector
    x2 = x.at[1, 2:].set(99.0)
    out2 = m.apply(params, x2, pad)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]), atol=1e-5)


def test_multihead_and_self_aggregation(rng):
    img = jnp.array(rng.randn(2, 4, 8).astype(np.float32))
    cap = jnp.array(rng.randn(2, 6, 8).astype(np.float32))
    m = SelfAggregation(8, n_head=2)
    params = m.init(jax.random.PRNGKey(0), img, cap)
    a, b = m.apply(params, img, cap)
    assert a.shape == (2, 8) and b.shape == (2, 8)


def test_sinusoidal_matches_reference_formula():
    pe = np.asarray(sinusoidal_positions(10, 8))
    import math

    assert abs(pe[3, 0] - math.sin(3)) < 1e-6
    assert abs(pe[3, 1] - math.cos(3)) < 1e-6
    assert abs(pe[5, 2] - math.sin(5 * math.exp(-2 * math.log(10000) / 8))) < 1e-5


def test_grid_positional_encoding(rng):
    m = PositionalEncodingImageGrid(8, n_regions=2)
    x = jnp.array(rng.randn(2, 4, 8).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == x.shape
    out_st = m.apply(params, jnp.array(rng.randn(2, 5, 8).astype(np.float32)), True)
    assert out_st.shape == (2, 5, 8)


def test_box_positional_encoding(rng):
    x = jnp.array(rng.randn(2, 3, 8).astype(np.float32))
    boxes = jnp.array(rng.rand(2, 3, 4).astype(np.float32))
    for mode in ("project-and-sum", "concat-and-process"):
        m = PositionalEncodingImageBoxes(8, mode=mode)
        params = m.init(jax.random.PRNGKey(0), x, boxes)
        assert m.apply(params, x, boxes).shape == x.shape


def test_gru_aggregator_final_state_semantics(rng):
    m = Aggregator(8, aggregation="gru")
    x = jnp.array(rng.randn(2, 5, 8).astype(np.float32))
    lengths = jnp.array([5, 2])
    pad = jnp.arange(5)[None, :] >= lengths[:, None]
    params = m.init(jax.random.PRNGKey(0), x, lengths, pad)
    out = m.apply(params, x, lengths, pad)
    # scribbling past the end must not change the final state
    x2 = x.at[1, 2:].set(7.0)
    out2 = m.apply(params, x2, lengths, pad)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]), atol=1e-6)
    assert np.abs(np.asarray(out[0]) - np.asarray(out2[0])).max() < 1e-6


def test_warmup_linear_schedule():
    s = warmup_linear_schedule(1.0, warmup_steps=10, total_steps=110)
    assert abs(float(s(5)) - 0.5) < 1e-6
    assert abs(float(s(10)) - 1.0) < 1e-6
    assert abs(float(s(60)) - 0.5) < 1e-6
    assert float(s(110)) == 0.0


def test_adamw_decay_mask(rng):
    import optax

    params = {
        "dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))},
        "layernorm": {"scale": jnp.ones((3,)), "bias": jnp.ones((3,))},
    }
    tx = make_adamw(lambda s: 0.1, weight_decay=0.5)
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    # only the dense kernel decays (nonzero update from weight decay)
    assert np.abs(np.asarray(updates["dense"]["kernel"])).max() > 0
    assert np.abs(np.asarray(updates["dense"]["bias"])).max() == 0
    assert np.abs(np.asarray(updates["layernorm"]["scale"])).max() == 0


def test_depth_transformer_mode(rng):
    """'transformer' depth aggregation is a latent UnboundLocalError in the
    reference (constructed ref:alad_model.py:97-99, never handled in
    ref:alad/utils.py:15-49); our completion must run and mix across depth."""
    from aladin_tpu.models.layers import DepthAggregator

    m = DepthAggregator("transformer", 8)
    x = jnp.asarray(rng.standard_normal((4, 2, 3, 8)), jnp.float32)
    pad = jnp.zeros((2, 3), bool)
    params = m.init(jax.random.PRNGKey(0), x, pad)
    out = m.apply(params, x, pad)
    assert out.shape == (2, 3, 8)
    assert np.isfinite(np.asarray(out)).all()
    # depends on non-final depth layers (really aggregates, not x[-1])
    x2 = x.at[0].add(1.0)
    out2 = m.apply(params, x2, pad)
    assert np.abs(np.asarray(out2 - out)).max() > 1e-4

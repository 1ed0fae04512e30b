"""BertImgConfig.fused_layernorm: model-level parity.

Locks that the fused residual+LayerNorm path (_ResidualLN routing to
ops/pallas/layernorm.py) is a pure kernel swap: identical param pytree,
matching forward outputs, and matching gradients (the custom_vjp backward
vs autodiff through nn.LayerNorm) for the full multi-layer backbone.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aladin_tpu.models.bert_img import BertImgConfig, BertImgModel


@pytest.fixture
def setup():
    cfg = BertImgConfig(vocab_size=120, hidden_size=64, num_hidden_layers=3,
                        num_attention_heads=4, intermediate_size=128,
                        img_feature_dim=20, max_position_embeddings=64)
    b, l, r = 4, 8, 5
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    ids = jax.random.randint(ks[0], (b, l), 0, 120, jnp.int32)
    mask = jnp.ones((b, l + r), jnp.int32)
    feats = jax.random.normal(ks[1], (b, r, 20))
    params = BertImgModel(cfg, dtype=jnp.float32).init(
        ks[2], ids, mask, img_feats=feats)["params"]
    return cfg, params, ids, mask, feats


def _apply(cfg, params, ids, mask, feats):
    return BertImgModel(cfg, dtype=jnp.float32).apply(
        {"params": params}, ids, mask, img_feats=feats, deterministic=True)[0]


def test_param_tree_identical(setup):
    cfg, params, ids, mask, feats = setup
    fcfg = dataclasses.replace(cfg, fused_layernorm=True)
    fparams = BertImgModel(fcfg, dtype=jnp.float32).init(
        jax.random.PRNGKey(2), ids, mask, img_feats=feats)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(fparams)


def test_forward_parity(setup):
    cfg, params, ids, mask, feats = setup
    base = _apply(cfg, params, ids, mask, feats)
    fused = _apply(dataclasses.replace(cfg, fused_layernorm=True),
                   params, ids, mask, feats)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=1e-4, atol=1e-4)


def test_quant_ln_epilogue_path_tracks_quant(setup):
    """quant_matmuls + fused_layernorm routes activation quantization into
    the LN epilogue (pre-quantized int8 into the W8A8 GEMMs). Same quant
    recipe, different quantization POINT (post-LN y in f32 vs the dynx
    kernel's in-GEMM quantize of the bf16 y) — outputs must track the
    dynx quant path tightly and the f32 path to quant tolerance."""
    cfg, params, ids, mask, feats = setup
    base = np.asarray(_apply(cfg, params, ids, mask, feats))
    qdyn = np.asarray(_apply(dataclasses.replace(cfg, quant_matmuls=True),
                             params, ids, mask, feats))
    qln = np.asarray(_apply(dataclasses.replace(cfg, quant_matmuls=True,
                                                fused_layernorm=True),
                            params, ids, mask, feats))

    def cos(a, b):
        a = a.reshape(-1, a.shape[-1]).mean(0)
        b = b.reshape(-1, b.shape[-1]).mean(0)
        return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(qln, qdyn) > 0.999
    assert cos(qln, base) > 0.99


def test_gradient_parity(setup):
    cfg, params, ids, mask, feats = setup

    def loss(cfg, params):
        return jnp.sum(jnp.tanh(_apply(cfg, params, ids, mask, feats)))

    g0 = jax.grad(lambda p: loss(cfg, p))(params)
    g1 = jax.grad(lambda p: loss(
        dataclasses.replace(cfg, fused_layernorm=True), p))(params)
    paths0 = jax.tree_util.tree_leaves_with_path(g0)
    paths1 = jax.tree_util.tree_leaves_with_path(g1)
    for (p0, l0), (p1, l1) in zip(paths0, paths1):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(p0))

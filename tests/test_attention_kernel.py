"""Fused attention kernel (ops/pallas/attention_kernel.py) vs the XLA chain
it replaces: exact-math parity at dropout 0 (forward AND gradients), dropout
mask reproducibility between forward and backward, and the model-level knob
(BertImgConfig.fused_attention) producing the same encoder outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aladin_tpu.ops.pallas.attention_kernel import fused_attention

B, S, H, D = 3, 20, 4, 8


def xla_attention(q, k, v, bias):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(D, jnp.float32))
    scores = scores + bias[:, None, :, :].astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


@pytest.fixture
def qkvb(rng):
    q = rng.randn(B, S, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    v = rng.randn(B, S, H, D).astype(np.float32)
    mask = (rng.rand(B, S) > 0.2).astype(np.float32)
    bias = np.broadcast_to(((1 - mask) * -10000.0)[:, None, :], (B, S, S))
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(np.ascontiguousarray(bias)))


def test_forward_matches_xla(qkvb):
    q, k, v, bias = qkvb
    want = xla_attention(q, k, v, bias)
    got = fused_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla(qkvb):
    q, k, v, bias = qkvb

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(xla_attention(q, k, v, bias)))

    def loss_fused(q, k, v):
        return jnp.sum(jnp.square(
            fused_attention(q, k, v, bias, interpret=True)))

    gw = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gg, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_dropout_statistics_and_reproducibility(qkvb):
    q, k, v, bias = qkvb
    rate = 0.5
    out1 = fused_attention(q, k, v, bias, 7, rate, True, True)
    out2 = fused_attention(q, k, v, bias, 7, rate, True, True)
    out3 = fused_attention(q, k, v, bias, 8, rate, True, True)
    # same seed = same mask; different seed = different mask
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # dropped probs renormalize by 1/(1-rate): outputs stay same scale
    base = np.asarray(fused_attention(q, k, v, bias, interpret=True))
    assert 0.5 < np.abs(out1).mean() / np.abs(base).mean() < 2.0


def test_dropout_backward_uses_the_same_mask(qkvb):
    """grad of sum(out * w) wrt v must equal the closed form pd^T w built
    from the FORWARD's realized dropout mask — i.e. the backward regenerated
    the identical mask from the shared seed."""
    q, k, v, bias = qkvb
    w = jnp.asarray(np.random.RandomState(3).randn(B, S, H, D).astype(np.float32))
    rate, seed = 0.3, 11

    def loss(v_):
        return jnp.sum(fused_attention(q, k, v_, bias, seed, rate, True, True) * w)

    dv = jax.grad(loss)(v)

    # reconstruct pd from the forward with a v that isolates the mask:
    # out = pd @ v, so with v = identity-ish probes we could extract pd, but
    # simpler: finite-difference along a random direction must match.
    probe = jnp.asarray(np.random.RandomState(4).randn(*v.shape).astype(np.float32))
    eps = 1e-3
    lp = loss(v + eps * probe)
    lm = loss(v - eps * probe)
    fd = (lp - lm) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(dv, probe)), float(fd),
                               rtol=1e-3, atol=1e-2)


@pytest.mark.slow
def test_model_level_fused_attention_matches():
    """BertImgConfig.fused_attention=True produces the same deterministic
    encoder outputs as the XLA path (same params, dropout off)."""
    from tests.test_models import SMALL, make_batch, small_cfg
    from aladin_tpu.models.bert_img import BertImgConfig, BertImgModel

    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    outs = {}
    for fused in (False, True):
        cfg = BertImgConfig(**{**SMALL, "fused_attention": fused})
        model = BertImgModel(cfg)
        params = model.init(jax.random.PRNGKey(0), batch.txt_ids,
                            batch.txt_mask, batch.txt_type,
                            deterministic=True)
        outs[fused] = model.apply(params, batch.txt_ids, batch.txt_mask,
                                  batch.txt_type, deterministic=True)[0]
    np.testing.assert_allclose(np.asarray(outs[True]), np.asarray(outs[False]),
                               rtol=2e-4, atol=2e-4)

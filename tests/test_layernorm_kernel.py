"""Fused residual+LayerNorm kernels (ops/pallas/layernorm.py).

Locks: forward parity vs flax nn.LayerNorm(x + res) in f32, the pallas
interpreter vs the XLA fallback, the custom_vjp backward vs autodiff of
the plain formula (incl. dgamma/dbeta and the shared residual gradient),
and the q8 variant's scales/values vs models/quant.quantize_rowwise.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aladin_tpu.models.quant import quantize_rowwise
from aladin_tpu.ops.pallas.layernorm import (
    layernorm_q8,
    residual_layernorm,
    residual_layernorm_q8,
)


@pytest.fixture
def rng():
    return np.random.RandomState(3)


def _inputs(rng, shape=(3, 7, 256)):
    d = shape[-1]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    res = jnp.asarray((rng.randn(*shape) * 0.5).astype(np.float32))
    gamma = jnp.asarray((1.0 + 0.1 * rng.randn(d)).astype(np.float32))
    beta = jnp.asarray((0.1 * rng.randn(d)).astype(np.float32))
    return x, res, gamma, beta


def _flax_ref(x, res, gamma, beta, eps=1e-12):
    ln = nn.LayerNorm(epsilon=eps)
    return ln.apply({"params": {"scale": gamma, "bias": beta}}, x + res)


@pytest.mark.parametrize("impl", ["xla", "interpret"])
def test_forward_matches_flax(rng, impl):
    x, res, gamma, beta = _inputs(rng)
    got = residual_layernorm(x, res, gamma, beta, 1e-12, impl)
    want = _flax_ref(x, res, gamma, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_bf16_and_odd_rows(rng):
    # M=3*11=33 exercises the block_m padding path; bf16 output dtype follows x
    x, res, gamma, beta = _inputs(rng, (3, 11, 128))
    got = residual_layernorm(x.astype(jnp.bfloat16), res.astype(jnp.bfloat16),
                             gamma, beta, 1e-12, "interpret")
    assert got.dtype == jnp.bfloat16
    want = _flax_ref(x, res, gamma, beta)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("impl", ["xla", "interpret"])
def test_backward_matches_autodiff(rng, impl):
    x, res, gamma, beta = _inputs(rng, (4, 5, 256))

    def plain(x, res, gamma, beta):
        h = x + res
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mean) ** 2, axis=-1, keepdims=True)
        y = (h - mean) * jax.lax.rsqrt(var + 1e-12) * gamma + beta
        return jnp.sum(jnp.sin(y))

    def fused(x, res, gamma, beta):
        return jnp.sum(jnp.sin(residual_layernorm(x, res, gamma, beta, 1e-12, impl)))

    want = jax.grad(plain, argnums=(0, 1, 2, 3))(x, res, gamma, beta)
    got = jax.grad(fused, argnums=(0, 1, 2, 3))(x, res, gamma, beta)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_q8_variant_matches_quantize_rowwise(rng):
    x, res, gamma, beta = _inputs(rng)
    for impl in ("xla", "interpret"):
        y, q, s = residual_layernorm_q8(x, res, gamma, beta, 1e-12, impl)
        np.testing.assert_allclose(np.asarray(y), np.asarray(_flax_ref(x, res, gamma, beta)),
                                   rtol=2e-5, atol=2e-5)
        qe, se = quantize_rowwise(y.astype(jnp.float32).reshape(-1, x.shape[-1]), axis=-1)
        # scales from the f32 kernel y vs the cast-back y differ below 1e-6
        np.testing.assert_allclose(np.asarray(s).ravel(), np.asarray(se).ravel(),
                                   rtol=1e-5)
        assert np.abs(np.asarray(q, np.int32)
                      - np.asarray(qe, np.int32).reshape(q.shape)).max() <= 1
        # dequantized parity is what the GEMM consumes
        np.testing.assert_allclose(
            np.asarray(q, np.float32) * np.asarray(s),
            np.asarray(y, np.float32), atol=2.5 * np.asarray(s).max())


def test_layernorm_q8_seed(rng):
    x = jnp.asarray(rng.randn(2, 9, 128).astype(np.float32))
    q, s = layernorm_q8(x)
    qe, se = quantize_rowwise(x.reshape(-1, 128), axis=-1)
    np.testing.assert_array_equal(np.asarray(q).reshape(-1, 128), np.asarray(qe))
    np.testing.assert_allclose(np.asarray(s).ravel(), np.asarray(se).ravel())


def test_all_zero_rows_stay_finite(rng):
    # padding rows (all-zero h) must not NaN through rsqrt or the q8 scale floor
    d = 128
    x = jnp.zeros((4, d), jnp.float32)
    res = jnp.zeros((4, d), jnp.float32)
    gamma = jnp.ones((d,), jnp.float32)
    beta = jnp.zeros((d,), jnp.float32)
    for impl in ("xla", "interpret"):
        y, q, s = residual_layernorm_q8(x, res, gamma, beta, 1e-12, impl)
        assert np.isfinite(np.asarray(y)).all()
        assert np.asarray(q).max() == 0 and np.asarray(q).min() == 0

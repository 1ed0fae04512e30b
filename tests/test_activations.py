"""gelu_exact: bit-identical forward, analytic backward (ops/activations.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aladin_tpu.ops.activations import gelu_exact


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_bit_identical(dtype, rng):
    x = jnp.asarray(rng.randn(64, 128) * 3, dtype)
    ours = jax.jit(gelu_exact)(x)
    ref = jax.jit(lambda v: jax.nn.gelu(v, approximate=False))(x)
    np.testing.assert_array_equal(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32))


def test_gradient_matches_autodiff(rng):
    x = jnp.asarray(rng.randn(512) * 4, jnp.float32)
    g_ours = jax.grad(lambda v: gelu_exact(v).sum())(x)
    g_ref = jax.grad(lambda v: jax.nn.gelu(v, approximate=False).sum())(x)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
    # extremes: saturated tails stay finite and correct (0 and 1 slopes)
    xt = jnp.asarray([-20.0, -8.0, 0.0, 8.0, 20.0], jnp.float32)
    gt = jax.grad(lambda v: gelu_exact(v).sum())(xt)
    np.testing.assert_allclose(np.asarray(gt), [0.0, 0.0, 0.5, 1.0, 1.0],
                               atol=1e-6)


def test_gradient_bf16(rng):
    x = jnp.asarray(rng.randn(256) * 3, jnp.bfloat16)
    g_ours = jax.grad(lambda v: gelu_exact(v).astype(jnp.float32).sum())(x)
    g_ref = jax.grad(
        lambda v: jax.nn.gelu(v, approximate=False).astype(jnp.float32).sum())(x)
    assert g_ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(g_ours, np.float32), np.asarray(g_ref, np.float32),
        atol=0.02)


def test_second_order_via_jvp_of_vjp(rng):
    # the custom vjp composes under further transforms (e.g. grad-of-grad
    # through the loss is not used today, but must not silently wrong-answer)
    x = jnp.asarray(rng.randn(32), jnp.float32)

    def dsum(v):
        return jax.grad(lambda u: gelu_exact(u).sum())(v).sum()

    ref = jax.grad(
        lambda v: jax.grad(
            lambda u: jax.nn.gelu(u, approximate=False).sum())(v).sum())(x)
    got = jax.grad(dsum)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

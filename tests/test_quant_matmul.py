"""Fused W8A8 Pallas GEMM (ops/pallas/quant_matmul.py) — interpret-mode
contract tests (run on CPU; the chip benchmarks live in
benchmarks/retrieval_eval_bench.py and PROGRESS.md).

Locks: exact-int32 GEMM + descale + bias parity, the in-kernel rational
erf gelu vs the backbone's exact-erf gelu, odd-M padding, and the
w8a8_dense_apply wrapper vs models/quant.QuantDense (same math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aladin_tpu.models.quant import QuantDense, quantize_rowwise
from aladin_tpu.ops.pallas.quant_matmul import w8a8_dense_apply, w8a8_matmul


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def _ref(xq, xs, wq, ws, b, activation=None):
    y = jnp.dot(xq.astype(jnp.int32), wq.astype(jnp.int32)).astype(jnp.float32)
    y = y * xs * ws + b
    if activation == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    elif activation == "gelu_tanh":
        y = jax.nn.gelu(y, approximate=True)
    return y


def _quant_inputs(rng, m, k, n):
    x = (rng.randn(m, k) * 0.4).astype(np.float32)
    w = (rng.randn(k, n) * 0.05).astype(np.float32)
    b = rng.randn(1, n).astype(np.float32)
    xq, xs = quantize_rowwise(jnp.asarray(x), axis=-1)
    wq, ws = quantize_rowwise(jnp.asarray(w), axis=0)
    return x, w, jnp.asarray(b), xq, xs.astype(jnp.float32), wq, ws.astype(jnp.float32)


def test_w8a8_matmul_exact_int32_parity(rng):
    _, _, b, xq, xs, wq, ws = _quant_inputs(rng, 96, 64, 256)
    got = w8a8_matmul(xq, xs, wq, ws, b, block_m=64, block_n=128,
                      out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(xq, xs, wq, ws, b)),
                               rtol=1e-6, atol=1e-6)


def test_w8a8_gelu_epilogue_matches_exact_erf(rng):
    """The in-kernel Abramowitz-Stegun erf (Pallas TPU has no erf
    primitive) must match jax.nn.gelu(approximate=False) to well below
    bf16 output precision (poly max err 1.5e-7)."""
    _, _, b, xq, xs, wq, ws = _quant_inputs(rng, 64, 64, 128)
    got = w8a8_matmul(xq, xs, wq, ws, b, activation="gelu", block_m=64,
                      block_n=128, out_dtype=jnp.float32, interpret=True)
    ref = _ref(xq, xs, wq, ws, b, activation="gelu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_w8a8_matmul_pads_odd_m(rng):
    _, _, b, xq, xs, wq, ws = _quant_inputs(rng, 70, 64, 128)
    got = w8a8_matmul(xq, xs, wq, ws, b, block_m=64, block_n=128,
                      out_dtype=jnp.float32, interpret=True)
    assert got.shape == (70, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(xq, xs, wq, ws, b)),
                               rtol=1e-6, atol=1e-6)


def test_w8a8_dense_apply_matches_quantdense(rng):
    """The kernel wrapper and the XLA-dot QuantDense module share one
    quantization recipe — same int8 codes, same scales, same output."""
    d_in, d_out = 64, 128
    x = jnp.asarray((rng.randn(3, 10, d_in) * 0.3).astype(np.float32))
    mod = QuantDense(features=d_out, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    got = w8a8_dense_apply(
        x, params["params"]["kernel"], params["params"]["bias"],
        out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_w8a8_gelu_tanh_epilogue(rng):
    """The fused tanh-gelu epilogue (BertImgConfig.hidden_act='gelu_tanh')
    must match jax.nn.gelu(approximate=True)."""
    _, _, b, xq, xs, wq, ws = _quant_inputs(rng, 64, 64, 128)
    got = w8a8_matmul(xq, xs, wq, ws, b, activation="gelu_tanh", block_m=64,
                      block_n=128, out_dtype=jnp.float32, interpret=True)
    ref = _ref(xq, xs, wq, ws, b, activation="gelu_tanh")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

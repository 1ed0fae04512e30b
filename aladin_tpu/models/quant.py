"""W8A8 dynamic-quantized dense layer for the eval/serving encode path.

The encode stage dominates end-to-end retrieval evaluation (~4.4 s of the
5.4 s full 5k-test pass) and is matmul-bound, so it is the one place where
the TPU's double-rate int8 MXU mode pays beyond the Pallas scoring kernel.
``QuantDense`` is a drop-in for ``nn.Dense`` with an IDENTICAL parameter
pytree (f32 ``kernel``/``bias``, same names/shapes) — checkpoints trained
in bf16/f32 load unchanged; quantization happens on the fly inside the
compiled program:

  * weights: symmetric per-output-channel absmax int8;
  * activations: symmetric per-token (per row of the (..., D) input)
    dynamic absmax int8;
  * product accumulates in int32 on the MXU
    (``preferred_element_type=int32``), dequantized by the rank-1 outer
    product of the two scale vectors, bias added in f32.

This is the standard robust W8A8 recipe for transformer inference; the
reference has no quantized path at all (its serving story is the fp32
matching head, ref:alad/plots/plot_efficiency_vs_effectiveness.py).
Accuracy is locked by tests/test_quant.py: encoder-output cosine vs the
f32 pass and end-to-end R@K parity on a trained synthetic model.

Opt-in via ``BertImgConfig(quant_matmuls=True)`` / ``cli/test
--int8_encoder``; training always uses the bf16 path.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array


def quantize_rowwise(x: Array, axis: int) -> tuple[Array, Array]:
    """Symmetric absmax int8 quantization along ``axis``.

    Returns (q, scale) with ``q * scale ~= x``; scale keeps a tiny floor so
    all-zero rows (padding tokens) stay exactly zero instead of NaN.
    """
    absmax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8).astype(jnp.float32) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def w8a8_apply(x: Array, kernel: Array, bias: Array, *,
               activation: str | None = None, out_dtype=jnp.bfloat16) -> Array:
    """Functional W8A8 dense: routes to the fused Pallas kernel on TPU
    (ops/pallas/quant_matmul.py — quantize + int8 MXU GEMM + dequant +
    bias [+ gelu] in one VMEM pass; 246-357 TOPS on v5e vs ~39 for XLA's
    own int8 ``dot_general`` lowering), or to the identical-math XLA path
    elsewhere (CPU tests, non-128-multiple dims). Parity between the two
    is locked by tests/test_quant_matmul.py."""
    if activation not in (None, "gelu", "gelu_tanh"):
        raise ValueError(f"unknown activation {activation!r} "
                         "(None | 'gelu' | 'gelu_tanh')")
    d_in, d_out = kernel.shape
    use_pallas = (
        jax.default_backend() == "tpu" and d_in % 128 == 0 and d_out % 128 == 0
    )
    if use_pallas:
        from aladin_tpu.ops.pallas.quant_matmul import w8a8_dense_apply

        return w8a8_dense_apply(x, kernel, bias, activation=activation,
                                out_dtype=out_dtype)
    wq, wscale = quantize_rowwise(kernel.astype(jnp.float32), axis=0)
    xq, xscale = quantize_rowwise(x, axis=-1)          # (..., in), (..., 1)
    y = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * xscale * wscale + bias.astype(jnp.float32)
    if activation == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    elif activation == "gelu_tanh":
        y = jax.nn.gelu(y, approximate=True)
    return y.astype(out_dtype)


def w8a8_apply_xq(xq: Array, xscale: Array, kernel: Array, bias: Array, *,
                  activation: str | None = None, out_dtype=jnp.bfloat16) -> Array:
    """W8A8 dense over PRE-quantized activations ``(xq int8, xscale f32)``.

    The production serving encoder gets its quantized activations from the
    fused residual-LayerNorm kernel's epilogue
    (ops/pallas/layernorm.residual_layernorm_q8) — the quantize never sits
    on the GEMM's critical path (round 3 measured that serialization
    costing more than the 2x int8 MXU rate won). Same math as
    ``w8a8_apply``; weight quantization happens here (XLA hoists it out of
    encode loops as loop-invariant)."""
    if activation not in (None, "gelu", "gelu_tanh"):
        raise ValueError(f"unknown activation {activation!r} "
                         "(None | 'gelu' | 'gelu_tanh')")
    d_in, d_out = kernel.shape
    lead = xq.shape[:-1]
    q2 = xq.reshape(-1, d_in)
    s2 = xscale.reshape(-1, 1)
    wq, ws = quantize_rowwise(kernel.astype(jnp.float32), axis=0)
    use_pallas = (
        jax.default_backend() == "tpu" and d_in % 128 == 0 and d_out % 128 == 0
    )
    if use_pallas:
        from aladin_tpu.ops.pallas.quant_matmul import w8a8_matmul

        y = w8a8_matmul(q2, s2, wq, ws.astype(jnp.float32),
                        bias.astype(jnp.float32).reshape(1, -1),
                        activation=activation, out_dtype=out_dtype)
    else:
        y = jax.lax.dot_general(
            q2, wq, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * s2 * ws + bias.astype(jnp.float32)
        if activation == "gelu":
            y = jax.nn.gelu(y, approximate=False)
        elif activation == "gelu_tanh":
            y = jax.nn.gelu(y, approximate=True)
        y = y.astype(out_dtype)
    return y.reshape(*lead, d_out)


class QuantDense(nn.Module):
    """nn.Dense-compatible W8A8 dynamic-quantized projection (see
    ``w8a8_apply`` for the compute contract and kernel routing)."""

    features: int
    dtype: Any = jnp.bfloat16
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()
    # optional fused epilogue: None | 'gelu' (exact erf) | 'gelu_tanh'
    activation: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d_in = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (d_in, self.features),
                            jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        return w8a8_apply(x, kernel, bias, activation=self.activation,
                          out_dtype=self.dtype)

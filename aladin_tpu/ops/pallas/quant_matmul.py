"""Fused W8A8 int8 GEMM Pallas kernel for the serving encoder.

Why: the encode stage dominates end-to-end retrieval eval (~4.4 s of 5.4 s)
and is GEMM-bound. The v5e MXU runs int8 at 2x the bf16 rate (394 vs 197
TOPS), but XLA's own int8 ``dot_general`` lowering measures a mere
~39 TOPS on this toolchain (4096^3 microbenchmark) - SLOWER than bf16 -
which is why the model-level W8A8 path (models/quant.py) showed no win in
round 2. This kernel issues the int8 MXU op directly and fuses the entire
epilogue (descale by the activation-row x weight-column scale outer
product, bias add, optional exact-erf gelu) into the same VMEM-resident
tile, so the int32 accumulator never round-trips HBM.

Contract (matches models/quant.py's math exactly):

  y = (xq int8 @ wq int8, int32 accum) * xscale * wscale + bias  [-> gelu]

  * xq (M, K) int8, xscale (M, 1) f32  - per-row (per-token) dynamic scales;
  * wq (K, N) int8, wscale (1, N) f32  - per-output-channel weight scales;
  * bias (1, N) f32; output bf16 (or ``out_dtype``).

Quantization of activations/weights happens OUTSIDE (cheap XLA elementwise
pass via models/quant.quantize_rowwise); the kernel is the GEMM + epilogue.
Grid (M/BM, N/BN), K unsplit (K = 768/3072 fits VMEM comfortably:
BM*K + K*BN int8 tiles + BM*BN f32 accumulator < 4 MB at the defaults).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7).

    Pallas TPU has no lowering for the erf primitive; this rational
    approximation is exact to well below bf16 output precision, so the
    fused gelu epilogue matches the backbone's exact-erf gelu
    (models/bert_img.py) at the dtype the caller sees.
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


ACTIVATIONS = (None, "gelu", "gelu_tanh")


def _epilogue(acc, scale_row, ws, b, activation):
    y = acc.astype(jnp.float32) * scale_row * ws + b
    if activation == "gelu":
        # exact-erf gelu - the backbone's default variant (models/bert_img.py)
        y = 0.5 * y * (1.0 + _erf(y * jnp.float32(0.7071067811865476)))
    elif activation == "gelu_tanh":
        # tanh approximation (BertImgConfig.hidden_act='gelu_tanh'), the
        # jax.nn.gelu(approximate=True) formula
        c = jnp.float32(0.7978845608028654)  # sqrt(2/pi)
        y = 0.5 * y * (1.0 + jnp.tanh(c * (y + 0.044715 * y * y * y)))
    return y


def _kernel(xq_ref, xs_ref, wq_ref, ws_ref, b_ref, o_ref, *, activation):
    acc = jnp.dot(xq_ref[:], wq_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = _epilogue(acc, xs_ref[:], ws_ref[:], b_ref[:], activation).astype(
        o_ref.dtype)


def _kernel_dynx(x_ref, wq_ref, ws_ref, b_ref, o_ref, *, activation):
    """bf16/f32 activations in; per-row absmax int8 quantization happens in
    VMEM (full K per tile, so the scales equal models/quant.quantize_rowwise
    exactly), then the int8 MXU dot. HBM activation traffic is identical to
    the bf16 path - the extra quantize pass that made the explicit-xq
    variant a net LOSS at encoder batch sizes never touches HBM here."""
    x = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) * jnp.float32(1.0 / 127.0)
    xq = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    acc = jnp.dot(xq, wq_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = _epilogue(acc, scale, ws_ref[:], b_ref[:], activation).astype(
        o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "block_m", "block_n", "out_dtype", "interpret"),
)
def w8a8_matmul(
    xq: Array,
    xscale: Array,
    wq: Array,
    wscale: Array,
    bias: Array,
    *,
    activation: str | None = None,
    block_m: int = 256,
    block_n: int | None = None,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Array:
    """(M, N) = dequant(xq @ wq) + bias [-> activation], fused on-chip.

    M pads to block_m, N must divide by block_n. K is taken whole per
    program. ``block_n=None`` picks the widest N split that keeps the
    weight tile + f32 accumulator in a ~12 MB VMEM budget — for the
    encoder's 768/3072 that is the whole N, i.e. the int8 weight loads
    into VMEM ONCE and the activation rows stream past it (the chip-swept
    optimum: 366 TOPS at M=8192, K=768, N=3072 vs 205 for bn=512).
    """
    if activation not in ACTIVATIONS:
        raise ValueError(f"unknown activation {activation!r} ({ACTIVATIONS})")
    m, k = xq.shape
    k2, n = wq.shape
    assert k == k2, (xq.shape, wq.shape)
    assert xscale.shape == (m, 1) and wscale.shape == (1, n), (
        xscale.shape, wscale.shape)
    assert bias.shape == (1, n), bias.shape

    bm = min(block_m, -(-m // 32) * 32)
    pad_m = (-m) % bm
    if pad_m:
        xq = jnp.pad(xq, ((0, pad_m), (0, 0)))
        xscale = jnp.pad(xscale, ((0, pad_m), (0, 0)))
    mp = m + pad_m
    if block_n is None:
        block_n = n
        while k * block_n + 4 * bm * block_n > 12 * 1024 * 1024 and block_n % 2 == 0:
            block_n //= 2
    bn = min(block_n, n)
    assert n % bn == 0, (n, bn)

    grid = (mp // bm, n // bn)
    out = pl.pallas_call(
        functools.partial(_kernel, activation=activation),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=xq.nbytes + wq.nbytes + mp * n * 2,
            transcendentals=mp * n if activation else 0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xq, xscale, wq, wscale, bias)
    return out[:m] if pad_m else out


@functools.partial(
    jax.jit,
    static_argnames=("activation", "block_m", "block_n", "out_dtype", "interpret"),
)
def w8a8_matmul_dynx(
    x: Array,
    wq: Array,
    wscale: Array,
    bias: Array,
    *,
    activation: str | None = None,
    block_m: int = 256,
    block_n: int | None = None,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Array:
    """Like w8a8_matmul, but takes UNquantized (M, K) bf16/f32 activations
    and quantizes each row on-chip inside the kernel (identical scales to
    quantize_rowwise - the tile holds the full K axis). This is the
    production encoder path: one HBM read of x, int8 MXU rate."""
    if activation not in ACTIVATIONS:
        raise ValueError(f"unknown activation {activation!r} ({ACTIVATIONS})")
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2, (x.shape, wq.shape)
    assert wscale.shape == (1, n) and bias.shape == (1, n), (
        wscale.shape, bias.shape)

    bm = min(block_m, -(-m // 32) * 32)
    pad_m = (-m) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = m + pad_m
    if block_n is None:
        block_n = n
        while k * block_n + 4 * bm * block_n > 12 * 1024 * 1024 and block_n % 2 == 0:
            block_n //= 2
    bn = min(block_n, n)
    assert n % bn == 0, (n, bn)

    grid = (mp // bm, n // bn)
    out = pl.pallas_call(
        functools.partial(_kernel_dynx, activation=activation),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=x.nbytes + wq.nbytes + mp * n * 2,
            transcendentals=mp * n if activation else 0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wq, wscale, bias)
    return out[:m] if pad_m else out


def w8a8_dense_apply(x: Array, kernel: Array, bias: Array, *,
                     activation: str | None = None, out_dtype=jnp.bfloat16,
                     interpret: bool = False) -> Array:
    """Drop-in quantized dense: bf16/f32 activations in, W8A8 GEMM inside.

    Same math as models/quant.QuantDense (per-token activation scales,
    per-output-channel weight scales, int32 accumulation) with the fused
    kernel doing quantize + GEMM + dequant + bias (+ gelu) in one VMEM
    pass. Weight quantization stays outside (XLA hoists it out of encode
    loops as loop-invariant). Leading batch dims are flattened into M.
    """
    from aladin_tpu.models.quant import quantize_rowwise

    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    wq, ws = quantize_rowwise(kernel.astype(jnp.float32), axis=0)
    y = w8a8_matmul_dynx(x2, wq, ws.astype(jnp.float32),
                         bias.astype(jnp.float32).reshape(1, -1),
                         activation=activation, out_dtype=out_dtype,
                         interpret=interpret)
    return y.reshape(*lead, y.shape[-1])

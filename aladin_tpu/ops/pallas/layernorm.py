"""Fused residual-add + LayerNorm Pallas kernels.

Every BERT encoder layer ends in ``LayerNorm(x + sublayer_out)`` twice —
48 LayerNorms per ALADIN train step (12 layers x 2 LNs x 2 towers),
chip-measured at ~8 ms of forward time at B=128 under XLA (the residual
add, the f32 stat pass and the normalize pass do not land in one fusion).
This module fuses the whole thing into a single VMEM pass per tile:

  h    = x + res                (f32)
  y    = (h - mean) * rsqrt(var + eps) * gamma + beta   (cast to out dtype)

Three entry points:

  * ``residual_layernorm``      — custom_vjp training/eval path. Forward
    is the fused kernel (stats saved); backward is the analytic LN
    gradient (one fused XLA pass) instead of autodiff's re-derived chain:
        dh     = rstd * (g*gamma - mean(g*gamma) - xhat * mean(g*gamma*xhat))
        dgamma = sum_rows g * xhat ; dbeta = sum_rows g
    dx == dres == dh, so the residual branch costs nothing extra.
  * ``residual_layernorm_q8``   — serving path for the W8A8 encoder
    (models/quant.py): same fused LN, PLUS a per-row symmetric absmax
    int8 quantize of y in the epilogue, emitting ``(y, q, s)``. This
    moves the activation quantize OFF the W8A8 GEMM's critical path
    (where it serialized VPU work against the double-rate MXU and made
    int8 encode a net loss in round 3) and into a pass that is
    bandwidth-bound anyway. The scales match models/quant.quantize_rowwise
    exactly (same absmax floor), so the downstream ``w8a8_matmul``
    (pre-quantized x) computes bit-identical GEMMs.
  * ``layernorm_q8``            — the no-residual variant for quantizing
    a raw hidden state (layer-0 input after the embedding LNs).

All entry points fall back to identical-math XLA on CPU / odd dims
(parity locked by tests/test_layernorm_kernel.py). The reference has no
analogue — torch's nn.LayerNorm rides cuDNN (ref:oscar/modeling/
modeling_bert.py BertLayerNorm usage); this is the TPU-native equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_rows(h: Array, g: Array, b: Array, eps: float):
    """f32 row LayerNorm: h (bm, D) -> (y, mean, rstd). Matches flax's
    fast-variance stats (E[h^2] - E[h]^2, clamped at 0)."""
    mean = jnp.mean(h, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(h * h, axis=1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + jnp.float32(eps))
    xhat = (h - mean) * rstd
    return xhat * g + b, mean, rstd


def _quantize_rows(y: Array):
    """Per-row symmetric absmax int8 — same math as models/quant.quantize_rowwise."""
    absmax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    # EXACTLY models/quant.quantize_rowwise's expression (division, not a
    # reciprocal multiply — the two can differ by 1 ulp of scale, which
    # moves a quantized value by a whole step for some absmax values)
    scale = jnp.maximum(absmax, 1e-8) / jnp.float32(127.0)
    q = jnp.clip(jnp.round(y / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _fwd_kernel(x_ref, res_ref, g_ref, b_ref, y_ref, mean_ref, rstd_ref, *, eps):
    h = x_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
    y, mean, rstd = _ln_rows(h, g_ref[:].astype(jnp.float32),
                             b_ref[:].astype(jnp.float32), eps)
    y_ref[:] = y.astype(y_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _fwd_kernel_q8(x_ref, res_ref, g_ref, b_ref, y_ref, q_ref, s_ref, *, eps):
    h = x_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
    y, _, _ = _ln_rows(h, g_ref[:].astype(jnp.float32),
                       b_ref[:].astype(jnp.float32), eps)
    y_ref[:] = y.astype(y_ref.dtype)
    q, s = _quantize_rows(y)
    q_ref[:] = q
    s_ref[:] = s


def _pallas_ln(x2, res2, gamma, beta, eps, *, want_stats, want_q8,
               out_dtype, block_m=256, interpret=False):
    """Shared pallas_call builder over flattened (M, D) operands."""
    m, d = x2.shape
    # round the row block to 32 (as quant_matmul does): covers the native
    # sublane tile of every output dtype here (8 f32 / 16 bf16 / 32 int8),
    # so small-M shapes can't hand Mosaic a fractional tile
    bm = min(block_m, -(-m // 32) * 32)
    pad_m = (-m) % bm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
        res2 = jnp.pad(res2, ((0, pad_m), (0, 0)))
    mp = m + pad_m
    g2 = gamma.astype(jnp.float32).reshape(1, d)
    b2 = beta.astype(jnp.float32).reshape(1, d)

    if want_q8:
        kernel = functools.partial(_fwd_kernel_q8, eps=eps)
        out_shape = (jax.ShapeDtypeStruct((mp, d), out_dtype),
                     jax.ShapeDtypeStruct((mp, d), jnp.int8),
                     jax.ShapeDtypeStruct((mp, 1), jnp.float32))
        out_specs = (pl.BlockSpec((bm, d), lambda i: (i, 0)),
                     pl.BlockSpec((bm, d), lambda i: (i, 0)),
                     pl.BlockSpec((bm, 1), lambda i: (i, 0)))
    else:
        kernel = functools.partial(_fwd_kernel, eps=eps)
        out_shape = (jax.ShapeDtypeStruct((mp, d), out_dtype),
                     jax.ShapeDtypeStruct((mp, 1), jnp.float32),
                     jax.ShapeDtypeStruct((mp, 1), jnp.float32))
        out_specs = (pl.BlockSpec((bm, d), lambda i: (i, 0)),
                     pl.BlockSpec((bm, 1), lambda i: (i, 0)),
                     pl.BlockSpec((bm, 1), lambda i: (i, 0)))

    outs = pl.pallas_call(
        kernel,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=10 * mp * d,
            bytes_accessed=x2.nbytes + res2.nbytes
            + mp * d * (2 + (1 if want_q8 else 0)),
            transcendentals=mp,
        ),
        interpret=interpret,
    )(x2, res2, g2, b2)
    if pad_m:
        outs = tuple(o[:m] for o in outs)
    if not want_stats and not want_q8:
        return outs[0]
    return outs


def _use_pallas(d: int, impl: str) -> bool:
    if impl == "xla":
        return False
    if impl in ("pallas", "interpret"):
        return True
    return jax.default_backend() == "tpu" and d % 128 == 0


# --------------------------------------------------------------------------
# training path: custom_vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def residual_layernorm(x: Array, res: Array, gamma: Array, beta: Array,
                       eps: float = 1e-12, impl: str = "auto") -> Array:
    """``LayerNorm(x + res) * gamma + beta`` over the last axis, fused.

    Output dtype follows ``x``; stats are f32 (at least as accurate as
    flax's ``nn.LayerNorm(dtype=...)``). ``impl``: auto | pallas | xla |
    interpret (interpret = pallas interpreter, for CPU kernel tests).
    """
    y, _, _ = _rln_fwd_impl(x, res, gamma, beta, eps, impl)
    return y


def _rln_fwd_impl(x, res, gamma, beta, eps, impl):
    d = x.shape[-1]
    if _use_pallas(d, impl):
        x2 = x.reshape(-1, d)
        y2, mean, rstd = _pallas_ln(
            x2, res.reshape(-1, d), gamma, beta, eps,
            want_stats=True, want_q8=False, out_dtype=x.dtype,
            interpret=(impl == "interpret"))
        return y2.reshape(x.shape), mean, rstd
    h = (x.astype(jnp.float32) + res.astype(jnp.float32)).reshape(-1, d)
    y2, mean, rstd = _ln_rows(h, gamma.astype(jnp.float32).reshape(1, d),
                              beta.astype(jnp.float32).reshape(1, d), eps)
    return y2.astype(x.dtype).reshape(x.shape), mean, rstd


def _rln_fwd(x, res, gamma, beta, eps, impl):
    y, mean, rstd = _rln_fwd_impl(x, res, gamma, beta, eps, impl)
    return y, (x, res, gamma, beta, mean, rstd)


def _rln_bwd(eps, impl, residuals, gy):
    x, res, gamma, beta, mean, rstd = residuals
    d = x.shape[-1]
    h = (x.astype(jnp.float32) + res.astype(jnp.float32)).reshape(-1, d)
    xhat = (h - mean) * rstd
    g = gy.astype(jnp.float32).reshape(-1, d)
    gg = g * gamma.astype(jnp.float32).reshape(1, d)
    m1 = jnp.mean(gg, axis=1, keepdims=True)
    m2 = jnp.mean(gg * xhat, axis=1, keepdims=True)
    dh32 = (rstd * (gg - m1 - xhat * m2)).reshape(x.shape)
    # cotangents take each primal's OWN dtype (x and res may differ)
    dx = dh32.astype(x.dtype)
    dres = dh32.astype(res.dtype)
    dgamma = jnp.sum(g * xhat, axis=0).astype(gamma.dtype)
    dbeta = jnp.sum(g, axis=0).astype(beta.dtype)
    return dx, dres, dgamma, dbeta


residual_layernorm.defvjp(_rln_fwd, _rln_bwd)


# --------------------------------------------------------------------------
# serving paths (no vjp)


def residual_layernorm_q8(x: Array, res: Array, gamma: Array, beta: Array,
                          eps: float = 1e-12, impl: str = "auto"):
    """Fused ``LayerNorm(x + res)`` that ALSO emits the per-row int8
    quantization of the output: returns ``(y, q, s)`` with
    ``q * s ~= y`` (scales per models/quant.quantize_rowwise). Serving
    only — feeds ``ops.pallas.quant_matmul.w8a8_matmul`` directly so the
    W8A8 GEMM never pays the activation-quantize on its critical path."""
    d = x.shape[-1]
    lead = x.shape[:-1]
    if _use_pallas(d, impl):
        y2, q2, s2 = _pallas_ln(
            x.reshape(-1, d), res.reshape(-1, d), gamma, beta, eps,
            want_stats=False, want_q8=True, out_dtype=x.dtype,
            interpret=(impl == "interpret"))
    else:
        h = (x.astype(jnp.float32) + res.astype(jnp.float32)).reshape(-1, d)
        y2, _, _ = _ln_rows(h, gamma.astype(jnp.float32).reshape(1, d),
                            beta.astype(jnp.float32).reshape(1, d), eps)
        q2, s2 = _quantize_rows(y2)
        y2 = y2.astype(x.dtype)
    return (y2.reshape(*lead, d), q2.reshape(*lead, d),
            s2.reshape(*lead, 1))


def layernorm_q8(x: Array, impl: str = "auto"):
    """Per-row int8 quantize of an already-normalized hidden state —
    the layer-0 seed for the quantized encoder (the embedding LNs ran in
    flax). One XLA pass; kept here so the scale math lives in one place."""
    del impl  # XLA fuses this fine; kept for signature symmetry
    d = x.shape[-1]
    lead = x.shape[:-1]
    q2, s2 = _quantize_rows(x.astype(jnp.float32).reshape(-1, d))
    return q2.reshape(*lead, d), s2.reshape(*lead, 1)

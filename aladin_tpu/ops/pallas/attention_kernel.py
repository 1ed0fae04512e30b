"""Fused self-attention for the BertImg geometry (<=134 tokens, head-dim 64).

The backbone's attention (models/bert_img.py BertSelfAttention,
ref:oscar/modeling/modeling_bert.py:23-147) is a dot-product chain XLA
compiles as: transpose (B,S,H,d)->(B,H,S,d) x3, batched QK^T, bias add,
f32 softmax, dropout, batched PV, transpose back. At this model's short
sequences (50-token captions / 84-token label+region streams, pad 128)
the chip ablation prices the chain at ~10 ms of the 116 ms B=128 step
(README roofline). Generic flash-attention kernels lose here (2.3x,
round-3 rejection) — they pay streaming machinery built for S >> VMEM.

This kernel is specialized to the regime instead: S fits WHOLE in VMEM, so
one grid program per batch row computes all heads' QK^T + bias + softmax +
dropout + PV in one VMEM pass — no (B,H,S,S) HBM materialization, no
layout transposes (q/k/v are read in their native (B,S,H,d) layout and ctx
is written back in it). The backward recomputes the probs in-VMEM
(flash-style, but exact — no tiling) and regenerates the IDENTICAL dropout
mask from the same per-(batch,head) PRNG seed, so nothing big is saved
between passes: residuals are just (q, k, v, bias).

Semantics vs the XLA path: identical math at dropout 0 (test-locked);
with dropout the mask comes from the TPU PRNG instead of the flax
'dropout' stream — same distribution, different draws (the rng_impl='rbg'
precedent). Engaged by BertImgConfig.fused_attention; A/B numbers in the
README roofline paragraph.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _keep_mask(shape, seed, rate, interpret):
    """Per-element keep mask from the TPU PRNG (or a traced-JAX fallback in
    interpret mode, where the Mosaic prng primitives have no CPU lowering).
    Deterministic in ``seed`` — the backward regenerates the same mask."""
    if interpret:
        return jax.random.bernoulli(jax.random.PRNGKey(seed), 1.0 - rate, shape)
    pltpu.prng_seed(seed)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= jnp.uint32(int(rate * (2 ** 32)))


def _attn_body(q, k, v, bias, h, d, dropout_rate, train, bh_seed,
               interpret=False):
    """All-heads attention for one batch row, entirely in registers/VMEM.

    q/k/v: (S, H, d) bf16/f32; bias: (Q, K) f32 additive. Returns (S, H*d).
    """
    s = q.shape[0]
    qh = jnp.transpose(q, (1, 0, 2))  # (H, S, d) — VMEM relayout, not HBM
    kh = jnp.transpose(k, (1, 0, 2))
    vh = jnp.transpose(v, (1, 0, 2))
    scores = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, S, S)
    scores = scores * (1.0 / (d ** 0.5)) + bias[None, :, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    if train and dropout_rate > 0.0:
        keep = _keep_mask(probs.shape, bh_seed, dropout_rate, interpret)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    ctx = jax.lax.dot_general(
        probs.astype(v.dtype), vh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, S, d)
    return jnp.transpose(ctx, (1, 0, 2)).reshape(s, h * d)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                h, d, dropout_rate, train, interpret):
    b = pl.program_id(0)
    q = q_ref[0]  # (S, H, d)
    out = _attn_body(q, k_ref[0], v_ref[0], bias_ref[0], h, d,
                     dropout_rate, train, seed_ref[0] + b, interpret)
    out_ref[0] = out.reshape(q.shape).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, h, d, dropout_rate, train,
                interpret):
    b = pl.program_id(0)
    q = q_ref[0].astype(jnp.float32)  # (S, H, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0]
    g = g_ref[0].astype(jnp.float32)  # (S, H, d) cotangent of ctx

    qh = jnp.transpose(q, (1, 0, 2))  # (H, S, d)
    kh = jnp.transpose(k, (1, 0, 2))
    vh = jnp.transpose(v, (1, 0, 2))
    gh = jnp.transpose(g, (1, 0, 2))

    inv_sqrt_d = 1.0 / (d ** 0.5)
    scores = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * inv_sqrt_d + bias[None, :, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (H, S, S)

    if train and dropout_rate > 0.0:
        # the SAME seed and draw order as the forward -> identical mask
        keep = _keep_mask(p.shape, seed_ref[0] + b, dropout_rate, interpret)
        scale = 1.0 / (1.0 - dropout_rate)
        pd = jnp.where(keep, p * scale, 0.0)
        # dV = pd^T g ; dpd = g V^T ; dp = dropout backward of dpd
        dv = jax.lax.dot_general(pd, gh, (((1,), (1,)), ((0,), (0,))))
        dpd = jax.lax.dot_general(gh, vh, (((2,), (2,)), ((0,), (0,))))
        dp = jnp.where(keep, dpd * scale, 0.0)
    else:
        dv = jax.lax.dot_general(p, gh, (((1,), (1,)), ((0,), (0,))))
        dp = jax.lax.dot_general(gh, vh, (((2,), (2,)), ((0,), (0,))))

    # softmax vjp: ds = p * (dp - sum(dp * p, axis=-1))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds * inv_sqrt_d
    dq = jax.lax.dot_general(ds, kh, (((2,), (1,)), ((0,), (0,))))  # (H,S,d)
    dk = jax.lax.dot_general(ds, qh, (((1,), (1,)), ((0,), (0,))))  # (H,S,d)

    dq_ref[0] = jnp.transpose(dq, (1, 0, 2)).astype(dq_ref.dtype)
    dk_ref[0] = jnp.transpose(dk, (1, 0, 2)).astype(dk_ref.dtype)
    dv_ref[0] = jnp.transpose(dv, (1, 0, 2)).astype(dv_ref.dtype)


def _specs(bsz, s, h, d, q_dim):
    # index_map receives (grid idx, scalar-prefetch refs...) — ignore the refs
    blk = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, *_: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    qkv = blk(1, s, h, d)
    bias = blk(1, q_dim, s)
    return qkv, bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_attention(q: Array, k: Array, v: Array, bias: Array,
                    seed: Optional[Array] = None,
                    dropout_rate: float = 0.0, train: bool = False,
                    interpret: bool = False) -> Array:
    """ctx (B, S, H, d) = softmax(QK^T/sqrt(d) + bias) V, fused per batch row.

    q/k/v: (B, S, H, d) in the projection layout (NO pre-transpose needed).
    bias: (B, Q, K) additive f32 (broadcast (B,1,1,K) masks before calling).
    ``train`` + ``dropout_rate`` > 0 applies in-kernel dropout to the probs
    from the TPU PRNG seeded per (seed, batch row); the backward regenerates
    the identical mask. ``seed`` is a () int32 array (traced is fine) and
    MUST differ call-to-call during training — fold the step/layer in.
    """
    return _fused_fwd_impl(q, k, v, bias, seed, dropout_rate, train, interpret)


def _seed_arr(seed):
    if seed is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(seed, jnp.int32).reshape(1)


def _fused_fwd_impl(q, k, v, bias, seed, dropout_rate, train, interpret):
    bsz, s, h, d = q.shape
    qspec, bspec = _specs(bsz, s, h, d, bias.shape[1])
    kern = functools.partial(_fwd_kernel, h=h, d=d,
                             dropout_rate=float(dropout_rate), train=train,
                             interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[qspec, qspec, qspec, bspec],
        out_specs=qspec,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, s, h, d), q.dtype),
        interpret=interpret,
    )(_seed_arr(seed), q, k, v, bias.astype(jnp.float32))


def _fused_fwd(q, k, v, bias, seed, dropout_rate, train, interpret):
    out = _fused_fwd_impl(q, k, v, bias, seed, dropout_rate, train, interpret)
    return out, (q, k, v, bias, seed)


def _fused_bwd(dropout_rate, train, interpret, res, g):
    q, k, v, bias, seed = res
    bsz, s, h, d = q.shape
    qspec, bspec = _specs(bsz, s, h, d, bias.shape[1])
    kern = functools.partial(_bwd_kernel, h=h, d=d,
                             dropout_rate=float(dropout_rate), train=train,
                             interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[qspec, qspec, qspec, bspec, qspec],
        out_specs=[qspec, qspec, qspec],
    )
    dq, dk, dv = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bsz, s, h, d), q.dtype)] * 3,
        interpret=interpret,
    )(_seed_arr(seed), q, k, v, bias.astype(jnp.float32), g.astype(q.dtype))
    # bias derives from the 1/0 attention mask and seed from the rng stream —
    # constants as far as optimization goes: zero cotangents
    dseed = None if seed is None else jnp.zeros_like(jnp.asarray(seed))
    return dq, dk, dv, jnp.zeros_like(bias), dseed


fused_attention.defvjp(_fused_fwd, _fused_bwd)

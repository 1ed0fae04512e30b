"""Fused MrSw alignment scoring as a Pallas TPU kernel.

The eval workload is score[i, c] = sum_w max_r <im[i, r], cap[c, w]> over a
(N_im x N_cap) corpus product (5k x 25k on COCO test) - the reference's
chunked-GPU loop (ref:alad/evaluation.py:199-211) at TPU scale.

Why a kernel: the natural XLA lowering materializes the (N_im, B_c, R, W)
alignment tensor in HBM between the matmul and the max/sum reduction; at 5k x
25k x 33 x 47 x 4B that is ~1.5 TB of round-trip traffic vs ~0.3 TB of
operand reads - the reduction, not the matmul, becomes the bottleneck
(SURVEY.md S7 "hard parts" #2). This kernel reduces each alignment tile in
VMEM on the fly, so HBM traffic drops to the operands + the output matrix.

Layout (chosen around Mosaic's (8, 128) tiling rules):

  * words padded W -> W48 (next multiple of 16; 47 -> 48) so a caption chunk
    of BCC=8 is a 384-lane matmul operand;
  * the kernel emits the TRANSPOSED (N_cap, N_im) matrix: output tiles are
    (BCC=8, BI=128) - full-tile stores, no unprovable lane offsets;
  * grid = (N_im/BI, N_cap/BCC), j minor: the (BI*R, D) image tile stays
    VMEM-resident across the caption sweep; caption tiles are small (0.6 MB)
    and stream;
  * per program: align = imgs (BI*R, D) @ caps_T (D, BCC*W48) on the MXU with
    f32 accumulation; max over R via a sublane-split reshape; word-sum as a
    tiny second matmul against a STATIC block-diagonal selector (iota-built).

Masking contract matches ops.alignment exactly: inputs are pre-normalized
and padded region rows AND padded word vectors are pre-zeroed. A zero word
vector yields a zero alignment column whose max-over-regions is exactly 0,
so summing it is a no-op - word masking needs no in-kernel length data; zero
region rows reproduce the reference's zero-fill floor in the max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aladin_tpu.ops.alignment import strip_special_tokens
from aladin_tpu.ops.masking import valid_mask
from aladin_tpu.ops.similarity import l2norm


def _mrsw_kernel(img_ref, cap_ref, out_ref, *, bi: int, r: int, r8: int, w48: int, bcc: int,
                 acc_dtype=jnp.float32):
    lanes = bcc * w48
    int8_mode = img_ref.dtype == jnp.int8
    align = jnp.dot(
        img_ref[:], cap_ref[:],
        preferred_element_type=jnp.int32 if int8_mode else jnp.float32,
    )
    if not int8_mode and acc_dtype != jnp.float32:
        align = align.astype(acc_dtype)  # narrow store; f32 MXU accumulation
    # Split rows into per-image groups of r8 (a multiple of 8 = sublane tile):
    # tile-aligned, so the reshape is free - no VMEM relayout copy. Rows
    # [r, r8) are pure layout padding; unlike the [img_len-1, r) zeros (the
    # reference's floor) they must NOT join the max, so reduce a row slice.
    a3 = align.reshape(bi, r8, lanes)
    m = a3[:, :r, :].max(axis=1).astype(jnp.float32)  # (BI, BCC*W48)
    row = jax.lax.broadcasted_iota(jnp.int32, (lanes, bcc), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (lanes, bcc), 1)
    sel = ((row // w48) == col).astype(jnp.float32)  # static block-diagonal
    # (BCC, BI) = sel^T-contract: sel (BCC*W48, BCC) x m (BI, BCC*W48)
    out_ref[:] = jax.lax.dot_general(
        sel, m, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


@functools.partial(
    jax.jit,
    static_argnames=("block_imgs", "block_caps", "interpret", "compute_dtype", "acc_dtype"),
)
def mrsw_scores_pallas(
    im_set: Array,
    s_seq: Array,
    im_len: Array,
    s_len: Array,
    *,
    block_imgs: int = 128,
    block_caps: int = 16,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    acc_dtype=jnp.float32,
) -> Array:
    """(N_im, N_cap) MrSw alignment scores, fused on-chip.

    Same contract as ops.alignment.alignment_scores(..., 'MrSw'): inputs are
    UN-stripped token sets with lengths including special tokens.
    block_imgs must be a multiple of 128 (output lane tiling); block_caps *
    padded-word-count must be a multiple of 128.
    """
    im_set = l2norm(im_set.astype(jnp.float32), eps=1e-12)
    s_seq = l2norm(s_seq.astype(jnp.float32), eps=1e-12)
    im_set, s_seq, im_len, s_len = strip_special_tokens(im_set, s_seq, im_len, s_len)

    n_im, r, d = im_set.shape
    n_cap, w, _ = s_seq.shape
    w48 = -(-w // 16) * 16  # pad words to a multiple of 16
    r8 = -(-r // 8) * 8  # pad regions to a sublane-tile multiple
    assert block_imgs % 128 == 0, block_imgs
    assert (block_caps * w48) % 128 == 0, (block_caps, w48)

    # Pre-zero padded regions AND padded words (see module docstring), pad
    # the corpus axes to tile multiples and the region axis to r8.
    im_set = jnp.where(valid_mask(im_len, r)[:, :, None], im_set, 0.0)
    s_seq = jnp.where(valid_mask(s_len, w)[:, :, None], s_seq, 0.0)
    pad_i = (-n_im) % block_imgs
    pad_c = (-n_cap) % block_caps
    im_set = jnp.pad(im_set, ((0, pad_i), (0, r8 - r), (0, 0)))
    s_seq = jnp.pad(s_seq, ((0, pad_c), (0, w48 - w), (0, 0)))
    ni, nc = n_im + pad_i, n_cap + pad_c

    if compute_dtype == jnp.int8:
        # Quantized scoring: symmetric per-tensor int8 with data-derived
        # scales (127 / max|coord| of the L2-normalized tokens). The MXU's
        # int8 path doubles peak throughput on v5e (394 vs 197 TOPS); the
        # int32 accumulation is exact, so the only error is coordinate
        # rounding (~1e-2 absolute on MrSw scores; rank-stable in practice -
        # use bf16/f32 when bit-level parity with the f32 path matters).
        s_im = 127.0 / jnp.maximum(jnp.max(jnp.abs(im_set)), 1e-6)
        s_cap = 127.0 / jnp.maximum(jnp.max(jnp.abs(s_seq)), 1e-6)
        imgs_flat = jnp.clip(jnp.round(im_set.reshape(ni * r8, d) * s_im), -127, 127).astype(jnp.int8)
        caps_t = jnp.clip(jnp.round(s_seq.reshape(nc * w48, d).T * s_cap), -127, 127).astype(jnp.int8)
        descale = 1.0 / (s_im * s_cap)
    else:
        imgs_flat = im_set.reshape(ni * r8, d).astype(compute_dtype)
        caps_t = s_seq.reshape(nc * w48, d).T.astype(compute_dtype)  # (D, NC*W48)
        descale = None

    grid = (ni // block_imgs, nc // block_caps)
    kernel = functools.partial(
        _mrsw_kernel, bi=block_imgs, r=r, r8=r8, w48=w48, bcc=block_caps,
        acc_dtype=acc_dtype,
    )
    flops = 2 * ni * r8 * d * nc * w48
    out_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_imgs * r8, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, block_caps * w48), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_caps, block_imgs), lambda i, j: (j, i)),
        out_shape=jax.ShapeDtypeStruct((nc, ni), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=imgs_flat.nbytes + caps_t.nbytes + ni * nc * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(imgs_flat, caps_t)
    out = out_t.T[:n_im, :n_cap]
    return out * descale if descale is not None else out


def mrsw_scores_reference(im_set, s_seq, im_len, s_len) -> np.ndarray:
    """Slow trusted path (ops.alignment) for kernel validation."""
    from aladin_tpu.ops.alignment import alignment_scores

    return np.asarray(alignment_scores(im_set, s_seq, im_len, s_len, "MrSw"))

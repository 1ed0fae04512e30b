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
  * REGION PACKING: images are processed in groups of 8, with rows
    interleaved as (group, region, image-in-group) so that sublane s of
    every 8-row tile belongs to image s. The per-image max over regions
    then reduces ACROSS tiles (sublane-preserving, cheap) instead of within
    a per-image sublane block - which would force padding each image's R
    rows to a multiple of 8 (r=33 -> 40, 17.5% wasted MXU rows in the r1
    layout). Zero padding rows disappear entirely: the matmul operand is
    exactly BI*R rows;
  * per program: align = imgs (BI*R, D) @ caps_T (D, BCC*W48) on the MXU
    with f32 accumulation; max over R via the cross-tile reduction above;
    word-sum as a tiny second matmul against a STATIC block-diagonal
    selector (iota-built).

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


def _mrsw_kernel(img_ref, cap_ref, out_ref, *, bi: int, r: int, w48: int, bcc: int,
                 acc_dtype=jnp.float32):
    lanes = bcc * w48
    int8_mode = img_ref.dtype == jnp.int8
    align = jnp.dot(
        img_ref[:], cap_ref[:],
        preferred_element_type=jnp.int32 if int8_mode else jnp.float32,
    )
    if not int8_mode and acc_dtype != jnp.float32:
        align = align.astype(acc_dtype)  # narrow store; f32 MXU accumulation
    # Rows arrive interleaved as (group, region, image-in-group=8): sublane s
    # of each 8-row tile is image s of its group. Splitting the row dim into
    # (groups, r, 8) is tile-aligned (free); the max over the region axis
    # reduces across tiles, preserving sublane structure. Exactly r rows per
    # image join the max - the reference's zero-fill floor comes from the
    # pre-zeroed [img_len-1, r) rows only, with no layout-padding rows.
    a4 = align.reshape(bi // 8, r, 8, lanes)
    m = a4.max(axis=1).reshape(bi, lanes).astype(jnp.float32)  # (BI, BCC*W48)
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
    block_imgs: int = 0,  # 0 = auto: 256 for int8, 128 otherwise (swept on v5e)
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
    if block_imgs == 0:
        # measured on v5e at 5k x 25k: int8 peaks at bi=256 (145.1M pairs/s),
        # bf16 at bi=128 (75.4M) - the larger int8 tile amortizes the halved
        # operand bytes across the same VMEM budget
        block_imgs = 256 if compute_dtype == jnp.int8 else 128
    assert block_imgs % 128 == 0, block_imgs
    assert (block_caps * w48) % 128 == 0, (block_caps, w48)

    # Pre-zero padded regions AND padded words (see module docstring), pad
    # the corpus axes to tile multiples.
    im_set = jnp.where(valid_mask(im_len, r)[:, :, None], im_set, 0.0)
    s_seq = jnp.where(valid_mask(s_len, w)[:, :, None], s_seq, 0.0)
    pad_i = (-n_im) % block_imgs
    pad_c = (-n_cap) % block_caps
    im_set = jnp.pad(im_set, ((0, pad_i), (0, 0), (0, 0)))
    s_seq = jnp.pad(s_seq, ((0, pad_c), (0, w48 - w), (0, 0)))
    ni, nc = n_im + pad_i, n_cap + pad_c

    # Region packing (see module docstring): interleave groups of 8 images so
    # operand row g*(8r) + j*8 + s = region j of image g*8+s. The kernel's
    # cross-tile max then lands image g*8+s at output row g*8+s - identity
    # order, no unscramble needed. One cheap XLA transpose, done once.
    im_inter = im_set.reshape(ni // 8, 8, r, d).transpose(0, 2, 1, 3).reshape(ni * r, d)

    if compute_dtype == jnp.int8:
        # Quantized scoring: symmetric per-tensor int8 with data-derived
        # scales (127 / max|coord| of the L2-normalized tokens). The MXU's
        # int8 path doubles peak throughput on v5e (394 vs 197 TOPS); the
        # int32 accumulation is exact, so the only error is coordinate
        # rounding (~1e-2 absolute on MrSw scores; rank parity with f32 is
        # test-locked to 0.1pp R@K - tests/test_eval.py).
        s_im = 127.0 / jnp.maximum(jnp.max(jnp.abs(im_inter)), 1e-6)
        s_cap = 127.0 / jnp.maximum(jnp.max(jnp.abs(s_seq)), 1e-6)
        imgs_flat = jnp.clip(jnp.round(im_inter * s_im), -127, 127).astype(jnp.int8)
        caps_t = jnp.clip(jnp.round(s_seq.reshape(nc * w48, d).T * s_cap), -127, 127).astype(jnp.int8)
        descale = 1.0 / (s_im * s_cap)
    else:
        imgs_flat = im_inter.astype(compute_dtype)
        caps_t = s_seq.reshape(nc * w48, d).T.astype(compute_dtype)  # (D, NC*W48)
        descale = None

    grid = (ni // block_imgs, nc // block_caps)
    kernel = functools.partial(
        _mrsw_kernel, bi=block_imgs, r=r, w48=w48, bcc=block_caps,
        acc_dtype=acc_dtype,
    )
    flops = 2 * ni * r * d * nc * w48
    out_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_imgs * r, d), lambda i, j: (i, 0)),
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


def mrsw_scores_bucketed(
    im_set: Array,
    s_seq: Array,
    im_len: Array,
    s_len: Array,
    *,
    bucket_multiple: int = 16,
    min_bucket_frac: float = 0.04,
    scorer=None,
    bucket_images: bool = False,
    image_bucket_multiple: int = 8,
    **kernel_kw,
) -> Array:
    """Length-bucketed MrSw scoring on BOTH corpus axes: IDENTICAL scores,
    far fewer padded-slot FLOPs on real data.

    Caption axis: the fixed-width kernel computes all W48 word lanes per
    caption; real COCO captions average ~14 wordpieces against a 50-slot
    buffer, so ~2/3 of the caption-axis MXU work multiplies zeros. Captions
    are grouped by ceil(len/16)*16 width, the kernel runs once per occupied
    bucket on the column subset sliced to that width, and score columns
    scatter back to corpus order. Parity is exact: a caption's tokens live
    in positions [0, len) <= bucket width, and the kernel's masking already
    zeroes everything past len (module docstring), so the dropped slots
    contributed exactly 0 to every score (a SUM over words).

    Image axis (``bucket_images``): the same cut on region rows - images
    grouped by region-count bucket, each bucket scored with its rows sliced
    to the bucket width, score ROWS scattered back. One asymmetry demands
    care: the region reduction is a MAX, not a sum, and the reference
    semantics (ref:alad/evaluation.py:199-211 max over a zero-filled fixed
    buffer) give every image with fewer regions than the buffer an implicit
    0-floor from its zeroed padding rows. Dropping ALL zero rows would lose
    that floor whenever every real alignment for some word is negative. So
    the bucket width is chosen STRICTLY greater than the stripped region
    count - ceil((len+1)/8)*8, capped at the full buffer - guaranteeing at
    least one zeroed row per non-full image; full-buffer images never had a
    floor and land in the (uncapped) full bucket. Scores stay bitwise
    identical: each alignment element is the same D-length contraction, and
    the max sees the same value set (real rows + at-least-one zero).

    One compile per occupied (image-width x caption-width) pair - at most
    (R/8) x (W/16), in practice <= 6 on real data.

    ``bucket_images`` defaults OFF: a measured rejection, three chip A/Bs
    deep. Small corpus (1000x5000, bf16): caption-only 625-681 ms vs
    both-axes 759-872 ms. Headline scale (5000x25000, int8, il~U[5,34] -
    a ~32% region-FLOP cut): plain 866 ms vs image-ONLY bucketing 935 ms
    (isolated via a single full-width caption bucket) vs both-axes
    1242 ms. The unbucketed int8 kernel already runs at ~90% of the
    394-TOPS int8 peak, and slicing operand ROWS (bi*r -> bi*r') is not
    FLOP-proportional in this grid - per-program fixed work (caption tile
    streaming, selector matmul, output store) is unchanged while compiles
    multiply (one per width pair, 55-80 s vs 10 s cold). Kept as opt-in
    library code with an exact-parity test because the 0-floor analysis
    above is the part worth preserving.

    Buckets holding < min_bucket_frac of their corpus axis merge upward - a
    sliver bucket costs a compile + a kernel launch but saves almost
    nothing.

    Host-side orchestration (numpy grouping, one pallas call per bucket) -
    intended for the eval path, not for use inside jit.

    ``scorer`` overrides the per-bucket scoring callable
    ((ims_subset, caps_subset, im_len_subset, s_len_subset) ->
    (n_im_bucket, n_cap_bucket) scores) - e.g. a mesh-sharded scorer
    (parallel.mesh.sharded_mrsw_scores); default is the local Pallas kernel
    with ``kernel_kw``.
    """
    s_len_np = np.asarray(s_len)
    n_cap, w, _ = s_seq.shape
    n_im = im_set.shape[0]

    if bucket_images and n_im > 1:
        r_buf = im_set.shape[1]
        il_np = np.asarray(im_len)
        # stripped count = il - 1 (strip_special_tokens drops slot 0);
        # width > stripped keeps the 0-floor row, cap at the full buffer.
        stripped = np.maximum(il_np - 1, 1)
        iw = np.minimum(
            np.ceil((stripped + 1) / image_bucket_multiple).astype(np.int64)
            * image_bucket_multiple,
            r_buf - 1,
        )
        uniq_i = np.sort(np.unique(iw))
        counts_i = {int(u): int((iw == u).sum()) for u in uniq_i}
        keep_i = [int(u) for u in uniq_i if counts_i[int(u)] >= min_bucket_frac * n_im]
        if not keep_i or keep_i[-1] != int(uniq_i[-1]):
            keep_i.append(int(uniq_i[-1]))
        for i, u in enumerate(iw):
            iw[i] = next(k for k in keep_i if k >= u)
        if not (len(keep_i) == 1 and keep_i[0] == r_buf - 1):
            sub_kw = dict(
                bucket_multiple=bucket_multiple,
                min_bucket_frac=min_bucket_frac,
                scorer=scorer,
                bucket_images=False,
                **kernel_kw,
            )
            im_len_dev = jnp.asarray(im_len)
            row_blocks, row_order = [], []
            for width in keep_i:
                ridx = np.nonzero(iw == width)[0]
                if ridx.size == 0:
                    continue
                dridx = jnp.asarray(ridx)
                # slot 0 (the stripped special slot) + width region slots
                sub_im = jnp.take(im_set, dridx, axis=0)[:, : width + 1]
                rows = mrsw_scores_bucketed(
                    sub_im, s_seq, jnp.take(im_len_dev, dridx), s_len, **sub_kw
                )
                row_blocks.append(jnp.asarray(rows, jnp.float32))
                row_order.append(ridx)
            # one inverse-permutation gather instead of K full-matrix
            # scatters (each .at[].set would rewrite the whole buffer)
            inv = np.empty(n_im, np.int64)
            inv[np.concatenate(row_order)] = np.arange(n_im)
            return jnp.concatenate(row_blocks, axis=0)[jnp.asarray(inv)]
    widths = np.minimum(
        np.ceil(np.maximum(s_len_np, 4) / bucket_multiple).astype(np.int64)
        * bucket_multiple, w,
    )
    uniq = np.sort(np.unique(widths))
    # merge sliver buckets into the next wider one (the widest never merges)
    counts = {int(u): int((widths == u).sum()) for u in uniq}
    keep = [int(u) for u in uniq if counts[int(u)] >= min_bucket_frac * n_cap]
    if not keep or keep[-1] != int(uniq[-1]):
        keep.append(int(uniq[-1]))
    for i, u in enumerate(widths):
        widths[i] = next(k for k in keep if k >= u)

    if scorer is None:
        scorer = functools.partial(mrsw_scores_pallas, **kernel_kw)
    if len(keep) == 1 and keep[0] == w:
        return scorer(im_set, s_seq, im_len, s_len)

    out = jnp.zeros((n_im, n_cap), jnp.float32)
    for width in keep:
        idx = np.nonzero(widths == width)[0]
        if idx.size == 0:
            continue
        didx = jnp.asarray(idx)
        sub = jnp.take(s_seq, didx, axis=0)[:, :width]
        sub_len = jnp.take(jnp.asarray(s_len), didx)
        scores = scorer(im_set, sub, im_len, sub_len)
        out = out.at[:, didx].set(jnp.asarray(scores, jnp.float32))
    return out


def mrsw_scores_reference(im_set, s_seq, im_len, s_len) -> np.ndarray:
    """Slow trusted path (ops.alignment) for kernel validation."""
    from aladin_tpu.ops.alignment import alignment_scores

    return np.asarray(alignment_scores(im_set, s_seq, im_len, s_len, "MrSw"))

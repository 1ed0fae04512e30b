"""Fine-grained region-word alignment scoring (the TERAN-style teacher head).

Behavioral contract (ref:alad/loss.py:70-159, class AlignmentContrastiveLoss):

  1. L2-normalize per-token embeddings (torch F.normalize, eps 1e-12).
  2. Strip special tokens: images drop token 0 (``im_set[:, 1:]``), captions
     drop token 0 and the last two slots (``s_seq[:, 1:-2]``); the effective
     lengths shrink by 1 and 3 (ref:alad/loss.py:87-90).
  3. alignments[b, c, r, w] = <im[b, r], s[c, w]>  (a (B_i, B_c, R, W) tensor).
  4. Zero out entries past each sample's length (ref:alad/loss.py:103-116).
     NOTE the zero-fill (not -inf): for max-type aggregations the padded
     zeros act as a floor at 0 whenever a row/col of real values is all
     negative. This is load-bearing reference behavior and is reproduced.
  5. Aggregate to a (B_i, B_c) score matrix; 7 modes (ref:alad/loss.py:120-149).

Static-shape note: the reference slices to the *batch max* length before
masking, so the set of padded (zero) positions depends on batch composition.
Here R and W are compile-time constants (max_img_seq_len - 1 and
max_seq_len - 3 after stripping); padded positions are always fully masked.
Two observable divergences follow. (a) The 'mean' mode denominator: the
reference's is the dynamic batch-max area, ours the static area. (b) The
zero floor for the BATCH-LONGEST sample: in the reference, the one image
(resp. caption) whose length equals the batch max has no padded rows, so
its max-over-regions (MrSw/symm; over-words for MwSr) can go negative,
while every other sample is floored at 0; with static shapes every sample
with length < R (resp. W) is floored. This differs only when a row of real
alignment values is ALL negative for the batch-longest sample — a
batch-composition-dependent quirk of the reference, not a semantic, and
unreachable by any dynamic-shape-free program. All shipped configs use
'MrSw' at training batch sizes where the effect is noise.

Eval-scale scoring (5k x 25k pairs) never materializes the 4-D tensor: see
:func:`score_all_pairs` (XLA blockwise scan) and the fused Pallas kernel in
ops/pallas/alignment_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from aladin_tpu.ops.masking import valid_mask
from aladin_tpu.ops.similarity import l2norm

AGGREGATIONS = ("sum", "mean", "MrSw", "MrAVGw", "symm", "MwSr", "scan-sentences")


def strip_special_tokens(im_set, s_seq, im_len, s_len):
    """Drop CLS/first-region (images) and CLS + last two slots (captions)."""
    return im_set[:, 1:, :], s_seq[:, 1:-2, :], im_len - 1, s_len - 3


def alignment_scores(
    im_set: Array,
    s_seq: Array,
    im_len: Array,
    s_len: Array,
    aggregation: str = "MrSw",
    *,
    normalized: bool = False,
) -> Array:
    """Dense (B_i, B_c) alignment score matrix.

    Args:
      im_set: (B_i, S_im, D) image token sets, UN-stripped (token 0 = the
        matching-head global slot / first region).
      s_seq: (B_c, S_s, D) caption token sequences, UN-stripped.
      im_len / s_len: (B_i,) / (B_c,) int32 lengths including special tokens.
      aggregation: one of AGGREGATIONS.
      normalized: True if inputs are already L2-normalized per token.
    """
    if aggregation not in AGGREGATIONS:
        raise ValueError(f"unknown aggregation {aggregation!r}")
    if not normalized:
        im_set = l2norm(im_set, eps=1e-12)
        s_seq = l2norm(s_seq, eps=1e-12)
    im_set, s_seq, im_len, s_len = strip_special_tokens(im_set, s_seq, im_len, s_len)
    im_valid = valid_mask(im_len, im_set.shape[1])  # (B_i, R)
    s_valid = valid_mask(s_len, s_seq.shape[1])  # (B_c, W)

    # (B_i, B_c, R, W) - fine at training scale (32^2 * 33 * 47 ~ 1.6M elems).
    align = jnp.einsum("brd,cwd->bcrw", im_set, s_seq, preferred_element_type=jnp.float32)
    pair_valid = im_valid[:, None, :, None] & s_valid[None, :, None, :]
    align = jnp.where(pair_valid, align, 0.0)

    if aggregation == "sum":
        return align.sum(axis=(2, 3))
    if aggregation == "mean":
        return align.mean(axis=(2, 3))
    if aggregation == "MrSw":
        # max over regions (padded zeros participate -> floor at 0), sum words.
        return align.max(axis=2).sum(axis=2)
    if aggregation == "MrAVGw":
        per_word = align.max(axis=2).sum(axis=2)
        return per_word / s_len.astype(per_word.dtype)[None, :]
    if aggregation == "symm":
        return align.max(axis=2).sum(axis=2) + align.max(axis=3).sum(axis=2)
    if aggregation == "MwSr":
        return align.max(axis=3).sum(axis=2)
    # scan-sentences
    return _scan_sentences(im_set, s_seq, im_valid, pair_valid, align)


def _scan_sentences(im_set, s_seq, im_valid, pair_valid, align):
    """SCAN-style attention aggregation (ref:alad/loss.py:136-149).

    relu -> L2-normalize over the region axis -> softmax over words (masked
    -inf) -> attention-weighted caption vector per region -> cosine with the
    region -> zero padded regions -> sum over regions. The reference produces
    NaNs on fully-padded region rows and masks them away afterwards; here the
    softmax is guarded so NaNs never appear.
    """
    w = jax.nn.relu(align)
    w = w / jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(w), axis=2, keepdims=True)), 1e-12)
    neg_inf = jnp.array(-jnp.inf, dtype=w.dtype)
    w = jnp.where(pair_valid, w, neg_inf)
    w_max = jnp.max(w, axis=3, keepdims=True)
    finite = jnp.isfinite(w)
    e = jnp.where(finite, jnp.exp(w - jnp.where(jnp.isfinite(w_max), w_max, 0.0)), 0.0)
    denom = jnp.sum(e, axis=3, keepdims=True)
    attn = jnp.where(denom > 0, e / jnp.maximum(denom, 1e-30), 0.0)  # (B,B,R,W)
    att_vec = jnp.einsum("bcrw,cwd->bcrd", attn, s_seq, preferred_element_type=jnp.float32)
    im = im_set[:, None, :, :]  # (B_i, 1, R, D)
    num = jnp.sum(im * att_vec, axis=3)
    # torch.nn.functional.cosine_similarity clamps the denominator at 1e-8
    den = jnp.maximum(jnp.linalg.norm(im, axis=3) * jnp.linalg.norm(att_vec, axis=3), 1e-8)
    cos = jnp.where(im_valid[:, None, :], num / den, 0.0)
    return cos.sum(axis=2)


def alignment_scores_chunked(
    im_set: Array,
    s_seq: Array,
    im_len: Array,
    s_len: Array,
    aggregation: str = "MrSw",
    chunk: int = 64,
    *,
    normalized: bool = False,
) -> Array:
    """alignment_scores with bounded memory: the caption axis is scanned in
    ``chunk``-sized blocks and each block is rematerialized in the backward
    pass (jax.checkpoint), so the (B_i, B_c, R, W) tensor never exists whole
    in either direction. Unlocks large-batch training where the quadratic
    in-batch tensor is the HBM wall (B=1024: 6.5 GB dense fwd alone).
    Differentiable; gradients match the dense path (tested)."""
    n_cap = s_seq.shape[0]
    pad = (-n_cap) % chunk
    if not normalized:
        im_set = l2norm(im_set, eps=1e-12)
        s_seq = l2norm(s_seq, eps=1e-12)
    s_seq_p = jnp.pad(s_seq, ((0, pad), (0, 0), (0, 0)))
    s_len_p = jnp.pad(s_len, (0, pad), constant_values=4)
    blocks = (n_cap + pad) // chunk
    s_seq_b = s_seq_p.reshape(blocks, chunk, *s_seq.shape[1:])
    s_len_b = s_len_p.reshape(blocks, chunk)

    @jax.checkpoint
    def block_fn(ims, seq, il, sl):
        return alignment_scores(ims, seq, il, sl, aggregation, normalized=True)

    def body(carry, blk):
        seq, ln = blk
        return carry, block_fn(im_set, seq, im_len, ln)

    _, out = jax.lax.scan(body, None, (s_seq_b, s_len_b))
    return jnp.transpose(out, (1, 0, 2)).reshape(im_set.shape[0], -1)[:, :n_cap]


@functools.partial(jax.jit, static_argnames=("aggregation", "block_caps", "normalized"))
def score_all_pairs(
    im_set: Array,
    s_seq: Array,
    im_len: Array,
    s_len: Array,
    aggregation: str = "MrSw",
    block_caps: int = 256,
    normalized: bool = False,
) -> Array:
    """(N_im, N_cap) alignment scores, streamed over caption blocks.

    The reference evaluates all-pairs alignment with a Python loop over
    cap_batches/im_batches chunks (ref:alad/evaluation.py:173-211,288-301).
    Here the caption axis is scanned in fixed-size blocks inside one compiled
    program so the (N_im, block, R, W) intermediate stays bounded and the
    matmuls stay MXU-sized. N_cap must be a multiple of block_caps (pad with
    dummy captions of length >= 4 and drop those columns afterwards).
    """
    n_cap = s_seq.shape[0]
    assert n_cap % block_caps == 0, (n_cap, block_caps)
    if not normalized:
        im_set = l2norm(im_set, eps=1e-12)
        s_seq = l2norm(s_seq, eps=1e-12)
    blocks = n_cap // block_caps
    s_seq_b = s_seq.reshape(blocks, block_caps, *s_seq.shape[1:])
    s_len_b = s_len.reshape(blocks, block_caps)

    def body(carry, blk):
        seq, ln = blk
        return carry, alignment_scores(im_set, seq, im_len, ln, aggregation, normalized=True)

    _, out = jax.lax.scan(body, None, (s_seq_b, s_len_b))
    # out: (blocks, N_im, block_caps) -> (N_im, N_cap)
    return jnp.transpose(out, (1, 0, 2)).reshape(im_set.shape[0], n_cap)

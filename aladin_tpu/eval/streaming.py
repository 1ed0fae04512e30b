"""Streaming recall evaluation: exact ranks without the dense score matrix.

The materialized path (eval/retrieval.py) computes the full (N_im, N_cap)
f32 matrix — 500 MB at COCO 5k-test scale, 200 GB at the 100k x 500k corpus
the serving stack already handles (eval/search.sharded_search). Every recall
metric, however, derives from RANKS, and a rank is a COUNT:

    rank(q) = #{j != gt(q) : S[q, j] > S[q, gt(q)]}

Ground-truth pair scores are O(N·gt_block) (each caption scored against ITS
image only, harvested as the DIAGONAL of small gathered paired blocks run
through the same tile scorer), so recall evaluation becomes:

  1. one cheap GT pass (all caption-image pair scores, blockwise);
  2. a streamed sweep over caption blocks: each (N_im, block) score tile
     updates per-image greater-than counters (i2t, one per GT slot) and
     emits per-caption ranks (t2i) — then the tile is DROPPED. This is the
     flash-attention-style streaming reduction over the corpus axis
     SURVEY.md S5.7 prescribes, generalizing the reference's chunked query
     loop (ref:alad/evaluation.py:173-211) which still materializes per-query
     score rows on the host.

Exactness: rank counting compares tile entries against GT scores, so both
MUST carry the same floating-point rounding. A per-pair einsum GT pass
lowers to a VPU reduce whose rounding differs from the MXU matmul's — on
real TPUs that flips ``S > gt`` for near-ties (observed on chip: rank off
by one). The GT pass therefore runs the SAME tile scorer on gathered
paired blocks and takes the diagonal: a same-K matmul element rounds
identically regardless of matrix shape, so the harvested GT is bit-equal
to the sweep's own copy of that entry AND to the materialized oracle's.
The GT's own column/row is still EXCLUDED from its count by index
arithmetic rather than by the strict inequality — after which the
streamed ranks equal the materialized ranks_from_score_matrix
(eval/recall.py) exactly, provided the oracle used the same scorer
(test-locked, including on-chip).

Memory: device holds the image-side buffers, ONE caption block, and integer
counters — (N_im, cpi) int32 + (block,) per tile. Caption buffers stream
from host (beyond-HBM corpora) or sit on device when they fit.

An optional top-k carry (running lax.top_k merge over blocks) returns the
top-k caption ids per image for downstream consumers; metrics never need it.

Mesh mode shards each caption block over the devices (the corpus-sharding
layout of parallel/mesh.py): t2i ranks complete locally per shard, i2t
counter partials are psum'd over the mesh — the counters are the ONLY
cross-device traffic.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.sharding import NamedSharding, PartitionSpec as P

from aladin_tpu.eval.recall import recall_metrics
from aladin_tpu.ops.similarity import l2norm

NEG = jnp.float32(-jnp.inf)


# ---------------------------------------------------------------------------
# the tile counting rule (shared by matching / alignment, solo / mesh)
# ---------------------------------------------------------------------------


def _tile_counts(S: Array, cols: Array, gt_flat: Array, cpi: int,
                 topk: int = 0) -> Tuple[Array, Array, Optional[Array]]:
    """Counter updates from one (N_im, B) score tile.

    S: tile scores with invalid (padding) columns already at -inf.
    cols: (B,) global caption indices of the tile's columns.
    gt_flat: (N_im * cpi,) GT pair scores, caption-indexed.

    Returns (d_i2t (N_im, cpi) count partials, t2i_ranks (B,) complete for
    these columns, tile top-k (scores, cols) or None).
    """
    n = S.shape[0]
    gt_i2t = gt_flat.reshape(n, cpi)
    rows = jnp.arange(n)
    parts = []
    for g in range(cpi):  # unrolled: keeps each compare+reduce fusable
        own_col = rows * cpi + g  # (N,) the GT's own column, excluded
        hit = (S > gt_i2t[:, g][:, None]) & (cols[None, :] != own_col[:, None])
        parts.append(hit.sum(axis=1, dtype=jnp.int32))
    d_i2t = jnp.stack(parts, axis=1)  # (N, cpi)

    gt_t2i = gt_flat[cols]  # (B,) padding cols gather garbage; S=-inf anyway
    own_row = cols // cpi
    hit_t = (S > gt_t2i[None, :]) & (rows[:, None] != own_row[None, :])
    t2i = hit_t.sum(axis=0, dtype=jnp.int32)

    tk = None
    if topk:
        k = min(topk, S.shape[1])
        v, i = jax.lax.top_k(S, k)
        tk = (v, cols[i])
    return d_i2t, t2i, tk


def _merge_topk(carry, tile, topk: int):
    """Running top-k merge: concat carry with the tile's top-k, re-top-k."""
    if carry is None:
        v, c = tile
        pad = topk - v.shape[1]
        if pad > 0:
            v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            c = jnp.pad(c, ((0, 0), (0, pad)), constant_values=-1)
        return v, c
    v = jnp.concatenate([carry[0], tile[0]], axis=1)
    c = jnp.concatenate([carry[1], tile[1]], axis=1)
    vv, ii = jax.lax.top_k(v, topk)
    return vv, jnp.take_along_axis(c, ii, axis=1)


# ---------------------------------------------------------------------------
# tile scorers
# ---------------------------------------------------------------------------


def _matching_tile(ims, caps_blk):
    return jnp.matmul(ims, caps_blk.T, preferred_element_type=jnp.float32)


def _alignment_tile(ims, il, caps_blk, cl_blk, aggregation, use_pallas,
                    interpret, compute_dtype):
    if aggregation == "MrSw" and use_pallas:
        from aladin_tpu.ops.pallas.alignment_kernel import mrsw_scores_pallas

        return mrsw_scores_pallas(ims, caps_blk, il, cl_blk,
                                  interpret=interpret,
                                  compute_dtype=compute_dtype)
    from aladin_tpu.ops.alignment import score_all_pairs

    block = min(256, caps_blk.shape[0])
    return score_all_pairs(ims, caps_blk, il, cl_blk, aggregation, block,
                           normalized=True)


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------


def _sweep(tile_fn, n_cap: int, cap_block: int, n_im: int, cpi: int,
           block_inputs, topk: int = 0):
    """Python-loop block sweep with a jitted per-tile update. ``tile_fn``
    maps (device block inputs, cols, col_valid) -> counter updates.
    ``block_inputs(lo, hi)`` returns the device inputs for one block."""
    counts = jnp.zeros((n_im, cpi), jnp.int32)
    t2i_parts = []
    tk = None
    for lo in range(0, n_cap, cap_block):
        hi = min(lo + cap_block, n_cap)
        cols = np.arange(lo, lo + cap_block)
        valid = cols < n_cap
        cols = np.where(valid, cols, 0)
        d_i2t, t2i, tile_tk = tile_fn(
            block_inputs(lo, hi), jnp.asarray(cols), jnp.asarray(valid))
        counts = counts + d_i2t
        t2i_parts.append(np.asarray(t2i)[: hi - lo])
        if topk:
            tk = _merge_topk(tk, tile_tk, topk)
    i2t_ranks = np.asarray(counts.min(axis=1))
    t2i_ranks = np.concatenate(t2i_parts)
    if topk:
        return i2t_ranks, t2i_ranks, (np.asarray(tk[0]), np.asarray(tk[1]))
    return i2t_ranks, t2i_ranks, None


def streaming_matching_ranks(
    img_glob,
    cap_glob,
    captions_per_image: int = 5,
    cap_block: int = 32768,
    topk: int = 0,
    mesh=None,
):
    """(i2t_ranks (N,), t2i_ranks (M,)[, topk (scores, ids)]) over global
    embeddings, never materializing the (N, M) matrix.

    img_glob: (N, D) UNIQUE image embeddings (callers with the 5-per-image
    row layout pass img_embs[::cpi]); cap_glob: (M, D) caption embeddings;
    both L2-normalized by the model. Captions may be a host numpy array —
    blocks transfer one at a time (the beyond-HBM case).
    """
    cpi = captions_per_image
    ims = jnp.asarray(img_glob, jnp.float32)
    n_im, n_cap = ims.shape[0], cap_glob.shape[0]
    assert n_cap == n_im * cpi, (n_cap, n_im, cpi)

    # GT pass: gt[j] = <im[j // cpi], cap[j]>, blockwise, harvested as the
    # DIAGONAL of gathered (rows @ blk.T) run through the same matmul as
    # the sweep tiles (module docstring: rounding-consistent GT — a cheaper
    # per-pair einsum flips near-tie comparisons on the MXU).
    gt_block = min(4096, cap_block)
    gt = np.empty((n_cap,), np.float32)

    @jax.jit
    def gt_diag(rows, blk):
        return jnp.diagonal(_matching_tile(rows, blk))

    for lo in range(0, n_cap, gt_block):
        hi = min(lo + gt_block, n_cap)
        blk = jnp.asarray(cap_glob[lo:hi], jnp.float32)
        rows = jnp.take(ims, jnp.asarray(np.arange(lo, hi) // cpi), axis=0)
        if hi - lo < gt_block:  # tail: pad to keep one compiled shape
            pad = gt_block - (hi - lo)
            blk = jnp.pad(blk, ((0, pad), (0, 0)))
            rows = jnp.pad(rows, ((0, pad), (0, 0)))
        gt[lo:hi] = np.asarray(gt_diag(rows, blk))[: hi - lo]
    gt_flat = jnp.asarray(gt)

    if mesh is not None:
        return _mesh_matching_sweep(mesh, ims, cap_glob, gt_flat, cpi,
                                    cap_block, topk)

    # the image buffer and GT vector are explicit jit ARGUMENTS, never
    # closure captures — captured concrete arrays become HLO constants,
    # which at 100k x 768 is a ~300 MB program (the axon remote-compile
    # relay rejects it outright)
    @jax.jit
    def tile(ims_, gt_, caps_blk, cols, valid):
        S = _matching_tile(ims_, caps_blk)
        S = jnp.where(valid[None, :], S, NEG)
        return _tile_counts(S, cols, gt_, cpi, topk)

    def block_inputs(lo, hi):
        blk = jnp.asarray(cap_glob[lo:hi], jnp.float32)
        if hi - lo < cap_block:  # tail: pad to keep one compiled shape
            blk = jnp.pad(blk, ((0, cap_block - (hi - lo)), (0, 0)))
        return blk

    def tile_fn(inputs, cols, valid):
        return tile(ims, gt_flat, inputs, cols, valid)

    i2t, t2i, tk = _sweep(tile_fn, n_cap, cap_block, n_im, cpi,
                          block_inputs, topk)
    return (i2t, t2i, tk) if topk else (i2t, t2i)


def _mesh_matching_sweep(mesh, ims, cap_glob, gt_flat, cpi, cap_block, topk):
    """Caption blocks sharded over the mesh; i2t counter partials psum'd."""
    axes = tuple(mesh.axis_names)
    n_dev = mesh.size
    blk_sz = -(-cap_block // n_dev) * n_dev  # divisible by the mesh
    n_im, n_cap = ims.shape[0], cap_glob.shape[0]
    rep = NamedSharding(mesh, P())
    ims = jax.device_put(ims, rep)
    gt_flat = jax.device_put(gt_flat, rep)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axes), P(axes), P(axes), P()),
        # per-shard top-k candidates concatenate along the k axis and merge
        # on host; i2t counter partials psum to a replicated total — the
        # counters are the only cross-device traffic per tile
        out_specs=(P(), P(axes), (P(None, axes), P(None, axes)))
        if topk else (P(), P(axes)),
    )
    def tile(ims_l, caps_blk, cols, valid, gt):
        S = _matching_tile(ims_l, caps_blk)
        S = jnp.where(valid[None, :], S, NEG)
        d_i2t, t2i, tk = _tile_counts(S, cols, gt, cpi, topk)
        d_i2t = jax.lax.psum(d_i2t, axes)
        if topk:
            return d_i2t, t2i, tk
        return d_i2t, t2i

    counts = jnp.zeros((n_im, cpi), jnp.int32)
    t2i_parts = []
    tk = None
    cap_sh = NamedSharding(mesh, P(axes))
    for lo in range(0, n_cap, blk_sz):
        hi = min(lo + blk_sz, n_cap)
        blk = np.zeros((blk_sz, ims.shape[1]), np.float32)
        blk[: hi - lo] = np.asarray(cap_glob[lo:hi], np.float32)
        cols = np.arange(lo, lo + blk_sz)
        valid = cols < n_cap
        cols = np.where(valid, cols, 0)
        out = tile(ims,
                   jax.device_put(blk, cap_sh),
                   jax.device_put(jnp.asarray(cols), cap_sh),
                   jax.device_put(jnp.asarray(valid), cap_sh),
                   gt_flat)
        if topk:
            d_i2t, t2i, tile_tk = out
            tk = _merge_topk(tk, tile_tk, topk)
        else:
            d_i2t, t2i = out
        counts = counts + d_i2t
        t2i_parts.append(np.asarray(t2i)[: hi - lo])
    i2t_ranks = np.asarray(counts.min(axis=1))
    t2i_ranks = np.concatenate(t2i_parts)
    if topk:
        return i2t_ranks, t2i_ranks, (np.asarray(tk[0]), np.asarray(tk[1]))
    return i2t_ranks, t2i_ranks


def streaming_alignment_ranks(
    img_sets,
    cap_seqs,
    img_lens,
    cap_lens,
    aggregation: str = "MrSw",
    captions_per_image: int = 5,
    cap_block: int = 2048,
    use_pallas: Optional[bool] = None,
    interpret: Optional[bool] = None,
    compute_dtype=None,
    mesh=None,
):
    """(i2t_ranks (N,), t2i_ranks (M,)) for the alignment head, streamed.

    img_sets: (M, S, D) encode buffers with images repeated per caption
    (dedup happens here, matching evaluate_alignment_head); cap_seqs may be
    host numpy (blocks transfer one at a time). ``mesh`` shards each caption
    block over the devices (image buffers replicated, i2t counter partials
    psum'd — the matching sweep's layout); GT stays the solo diagonal
    harvest, which is rounding-consistent because the per-shard tile runs
    the identical scorer on the identical pair operands.
    """
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None:
        use_pallas = on_tpu
    if interpret is None:
        interpret = not on_tpu
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16
    cpi = captions_per_image
    # dedup on host first: transfers N rows, not the 5N-row buffer
    ims = l2norm(jnp.asarray(np.asarray(img_sets)[::cpi]), eps=1e-12)
    il = jnp.asarray(np.asarray(img_lens)[::cpi])
    n_im = ims.shape[0]
    n_cap = cap_seqs.shape[0]
    assert n_cap == n_im * cpi, (n_cap, n_im, cpi)
    cl_np = np.asarray(cap_lens)

    # GT pass: caption j against image j // cpi, harvested as the DIAGONAL
    # of gathered paired blocks run through the SAME tile scorer (module
    # docstring: the pallas kernel computes in bf16 — any other GT path
    # would carry different rounding and flip near-tie comparisons).
    gt_block = min(512, cap_block)
    gt = np.empty((n_cap,), np.float32)

    @jax.jit
    def gt_diag(rows, il_rows, blk, cl_blk):
        S = _alignment_tile(rows, il_rows, blk, cl_blk, aggregation,
                            use_pallas, interpret, compute_dtype)
        return jnp.diagonal(S)

    for lo in range(0, n_cap, gt_block):
        hi = min(lo + gt_block, n_cap)
        # padded tail repeats row 0 (sliced off); keeps one compiled shape
        idx = np.minimum(np.arange(lo, lo + gt_block), hi - 1)
        rows = jnp.take(ims, jnp.asarray(idx // cpi), axis=0)
        il_rows = jnp.take(il, jnp.asarray(idx // cpi), axis=0)
        blk = np.asarray(cap_seqs[idx], np.float32)
        cl_blk = cl_np[idx]
        gt[lo:hi] = np.asarray(gt_diag(
            rows, il_rows, l2norm(jnp.asarray(blk), eps=1e-12),
            jnp.asarray(cl_blk)))[: hi - lo]
    gt_flat = jnp.asarray(gt)

    if mesh is not None:
        return _mesh_alignment_sweep(
            mesh, ims, il, cap_seqs, cl_np, gt_flat, cpi, cap_block,
            aggregation, use_pallas, interpret, compute_dtype)

    # big buffers as explicit jit args, not closure constants (see
    # streaming_matching_ranks — the remote-compile payload limit)
    @jax.jit
    def tile(ims_, il_, gt_, blk, cl_blk, cols, valid):
        S = _alignment_tile(ims_, il_, blk, cl_blk, aggregation, use_pallas,
                            interpret, compute_dtype)
        S = jnp.where(valid[None, :], S, NEG)
        return _tile_counts(S, cols, gt_, cpi)

    def block_inputs(lo, hi):
        blk = np.zeros((cap_block,) + cap_seqs.shape[1:], np.float32)
        blk[: hi - lo] = np.asarray(cap_seqs[lo:hi], np.float32)
        cl_blk = np.full((cap_block,), 4, np.int32)
        cl_blk[: hi - lo] = cl_np[lo:hi]
        return l2norm(jnp.asarray(blk), eps=1e-12), jnp.asarray(cl_blk)

    def tile_fn(inputs, cols, valid):
        blk, cl_blk = inputs
        return tile(ims, il, gt_flat, blk, cl_blk, cols, valid)

    i2t, t2i, _ = _sweep(tile_fn, n_cap, cap_block, n_im, cpi, block_inputs)
    return i2t, t2i


def _mesh_alignment_sweep(mesh, ims, il, cap_seqs, cl_np, gt_flat, cpi,
                          cap_block, aggregation, use_pallas, interpret,
                          compute_dtype):
    """Alignment-head sweep with caption blocks sharded over the mesh —
    the corpus-axis layout of _mesh_matching_sweep applied to the rerank
    head: image buffers replicated, each shard scores its caption slice
    with the full tile scorer, t2i ranks complete locally, i2t counter
    partials psum to a replicated total (the only cross-device traffic)."""
    axes = tuple(mesh.axis_names)
    n_dev = mesh.size
    blk_sz = -(-cap_block // n_dev) * n_dev  # divisible by the mesh
    n_im, n_cap = ims.shape[0], cap_seqs.shape[0]
    rep = NamedSharding(mesh, P())
    ims = jax.device_put(ims, rep)
    il = jax.device_put(il, rep)
    gt_flat = jax.device_put(gt_flat, rep)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axes), P(axes), P(axes), P(axes), P()),
        out_specs=(P(), P(axes)),
    )
    def tile(ims_l, il_l, blk, cl_blk, cols, valid, gt):
        S = _alignment_tile(ims_l, il_l, blk, cl_blk, aggregation,
                            use_pallas, interpret, compute_dtype)
        S = jnp.where(valid[None, :], S, NEG)
        d_i2t, t2i, _ = _tile_counts(S, cols, gt, cpi)
        return jax.lax.psum(d_i2t, axes), t2i

    counts = jnp.zeros((n_im, cpi), jnp.int32)
    t2i_parts = []
    cap_sh = NamedSharding(mesh, P(axes))
    for lo in range(0, n_cap, blk_sz):
        hi = min(lo + blk_sz, n_cap)
        blk = np.zeros((blk_sz,) + cap_seqs.shape[1:], np.float32)
        blk[: hi - lo] = np.asarray(cap_seqs[lo:hi], np.float32)
        cl_blk = np.full((blk_sz,), 4, np.int32)
        cl_blk[: hi - lo] = cl_np[lo:hi]
        cols = np.arange(lo, lo + blk_sz)
        valid = cols < n_cap
        cols = np.where(valid, cols, 0)
        d_i2t, t2i = tile(
            ims, il,
            jax.device_put(l2norm(jnp.asarray(blk), eps=1e-12), cap_sh),
            jax.device_put(jnp.asarray(cl_blk), cap_sh),
            jax.device_put(jnp.asarray(cols), cap_sh),
            jax.device_put(jnp.asarray(valid), cap_sh),
            gt_flat)
        counts = counts + d_i2t
        t2i_parts.append(np.asarray(t2i)[: hi - lo])
    return np.asarray(counts.min(axis=1)), np.concatenate(t2i_parts)


# ---------------------------------------------------------------------------
# metric front-ends
# ---------------------------------------------------------------------------


def _metrics(i2t_ranks, t2i_ranks) -> Tuple[Dict[str, float], Dict[str, float]]:
    return recall_metrics(i2t_ranks), recall_metrics(t2i_ranks)


def streaming_matching_recall(img_glob, cap_glob, captions_per_image: int = 5,
                              cap_block: int = 32768, mesh=None) -> Dict[str, float]:
    """compute_recall-compatible dict (i2t_*/t2i_*/rsum), streamed."""
    i2t, t2i = streaming_matching_ranks(
        img_glob, cap_glob, captions_per_image, cap_block, mesh=mesh)
    m_i2t, m_t2i = _metrics(i2t, t2i)
    out = {f"i2t_{k}": v for k, v in m_i2t.items()}
    out.update({f"t2i_{k}": v for k, v in m_t2i.items()})
    out["rsum"] = sum(out[k] for k in (
        "i2t_r1", "i2t_r5", "i2t_r10", "t2i_r1", "t2i_r5", "t2i_r10"))
    return out


def streaming_alignment_recall(img_sets, cap_seqs, img_lens, cap_lens,
                               aggregation: str = "MrSw",
                               captions_per_image: int = 5,
                               cap_block: int = 2048,
                               **kw) -> Tuple[Dict[str, float], Dict[str, float]]:
    """(i2t, t2i) metric dicts matching evaluate_alignment_head's, streamed
    (no NDCG — that needs full per-query orderings by construction)."""
    i2t, t2i = streaming_alignment_ranks(
        img_sets, cap_seqs, img_lens, cap_lens, aggregation,
        captions_per_image, cap_block, **kw)
    return _metrics(i2t, t2i)

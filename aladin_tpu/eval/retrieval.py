"""Alignment-head retrieval evaluation (i2t / t2i) from a full score matrix.

The reference loops per query, re-scoring chunks on GPU
(ref:alad/evaluation.py:158-241 i2t, :244-327 t2i). Mathematically both
directions read the SAME (N_unique_images, N_captions) alignment score
matrix; here it is computed once - streamed/fused on TPU (Pallas kernel or
XLA scan) and optionally sharded over a device mesh - and ranks for both
directions are extracted from it. This halves the reference's work and turns
its Python loop into one compiled program.

Semantics preserved:
  * i2t rank = best rank among the image's 5 GT captions
    (ref:evaluation.py:217-223);
  * t2i rank = rank of the GT image among unique images
    (ref:evaluation.py:303-307);
  * metrics + medr/meanr identical (ref:evaluation.py:231-235,316-320);
  * optional NDCG via a DCG scorer consuming per-query sorted indices
    (ref:evaluation.py:225-228,310-313).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from aladin_tpu.eval.recall import ranks_from_score_matrix as _ranks_from_scores
from aladin_tpu.eval.recall import recall_metrics


def i2t_from_scores(
    scores, captions_per_image: int = 5, ndcg_scorer=None, fold_index: int = 0
) -> Dict[str, float]:
    i2t, _ = _ranks_from_scores(jnp.asarray(scores), captions_per_image)
    out = recall_metrics(np.asarray(i2t))
    out["ndcg_rougel"], out["ndcg_spice"] = _ndcg(
        scores, ndcg_scorer, fold_index, retrieval="sentence"
    )
    return out


def t2i_from_scores(
    scores, captions_per_image: int = 5, ndcg_scorer=None, fold_index: int = 0
) -> Dict[str, float]:
    _, t2i = _ranks_from_scores(jnp.asarray(scores), captions_per_image)
    out = recall_metrics(np.asarray(t2i))
    out["ndcg_rougel"], out["ndcg_spice"] = _ndcg(
        scores, ndcg_scorer, fold_index, retrieval="image"
    )
    return out


def _ndcg(scores, ndcg_scorer, fold_index: int, retrieval: str) -> Tuple[float, float]:
    """Host-side NDCG over sorted indices, when a scorer is wired in.

    The shipped reference constructs the scorer as None (SURVEY.md S2.6(11)),
    returning zeros; we honor the same default but keep the machinery live.
    compute_ndcg's dict is read BY METHOD NAME — a scorer built with only
    one relevance matrix (e.g. methods=['spice']) must not mislabel it.
    """
    if ndcg_scorer is None:
        return 0.0, 0.0
    s = np.asarray(scores) if retrieval == "sentence" else np.asarray(scores).T
    npts = np.asarray(scores).shape[0]
    rougel, spice = [], []
    for q in range(s.shape[0]):
        inds = np.argsort(s[q])[::-1]
        vals = ndcg_scorer.compute_ndcg(npts, q, inds.astype(int), fold_index, retrieval)
        rougel.append(float(vals.get("rougeL", 0.0)))
        spice.append(float(vals.get("spice", 0.0)))
    return float(np.mean(rougel)), float(np.mean(spice))


def retrieval_metrics_from_scores(
    scores, captions_per_image: int = 5, ndcg_scorer=None, fold_index: int = 0
) -> Tuple[Dict[str, float], Dict[str, float]]:
    """(i2t, t2i) metric dicts with ONE rank extraction — the ranks kernel
    computes both directions anyway, so calling the single-direction
    helpers back-to-back would run it twice on the same matrix."""
    i2t_r, t2i_r = _ranks_from_scores(jnp.asarray(scores), captions_per_image)
    i2t = recall_metrics(np.asarray(i2t_r))
    t2i = recall_metrics(np.asarray(t2i_r))
    i2t["ndcg_rougel"], i2t["ndcg_spice"] = _ndcg(
        scores, ndcg_scorer, fold_index, retrieval="sentence")
    t2i["ndcg_rougel"], t2i["ndcg_spice"] = _ndcg(
        scores, ndcg_scorer, fold_index, retrieval="image")
    return i2t, t2i


def evaluate_alignment_head(
    img_sets,
    cap_seqs,
    img_lens,
    cap_lens,
    aggregation: str = "MrSw",
    captions_per_image: int = 5,
    use_pallas: Optional[bool] = None,
    ndcg_scorer=None,
    score_fn: Optional[Callable] = None,
    compute_dtype=None,
    interpret: Optional[bool] = None,
    bucket_captions: Optional[bool] = None,
) -> Tuple[Dict[str, float], Dict[str, float], Array]:
    """Full alignment-head eval: (i2t metrics, t2i metrics, score matrix).

    img_sets: (5N, S_im, D) grouped buffers (duplicates deduped internally),
    cap_seqs: (5N, S_s, D). Uses the fused Pallas MrSw kernel when
    aggregation == 'MrSw' (unless disabled), the XLA blockwise scorer
    otherwise; ``score_fn`` overrides both (e.g. a mesh-sharded scorer).

    ``compute_dtype=jnp.int8`` selects the quantized double-rate MXU kernel
    mode (the --compute_dtype int8 serving path); it forces the Pallas
    scorer, in interpret mode off-TPU, since only the kernel has an int8
    path. Default bf16.

    ``bucket_captions``: length-bucket the caption axis
    (mrsw_scores_bucketed) - identical scores, far fewer padded-word FLOPs
    when captions are much shorter than the buffer (real COCO). None =
    auto: engage when the estimated saving is >= 25%. Applies to the local
    Pallas path AND a mesh ``score_fn`` (each bucket scored sharded).
    """
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None:
        use_pallas = on_tpu
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16
    if compute_dtype == jnp.int8:
        use_pallas = True
    if interpret is None:
        interpret = not on_tpu
    k = captions_per_image
    ims = jnp.asarray(img_sets)[::k]
    il = jnp.asarray(img_lens)[::k]
    caps = jnp.asarray(cap_seqs)
    cl = jnp.asarray(cap_lens)

    if bucket_captions is None:
        # engage the bucketed scorer when the caption axis saves >= 25% of
        # its padded-word FLOPs. Image-axis bucketing exists
        # (mrsw_scores_bucketed(bucket_images=True)) but never auto-engages:
        # a chip A/B measured it strictly slower (regions sit on the
        # kernel's contraction tile - see its docstring).
        w = caps.shape[1]
        cl_np = np.asarray(cap_lens)
        mean_bucket = np.minimum(
            np.ceil(np.maximum(cl_np, 4) / 16.0) * 16, w).mean()
        bucket_captions = mean_bucket <= 0.75 * w

    if score_fn is not None:
        if bucket_captions:
            from aladin_tpu.ops.pallas.alignment_kernel import mrsw_scores_bucketed

            scores = mrsw_scores_bucketed(ims, caps, il, cl, scorer=score_fn)
        else:
            scores = score_fn(ims, caps, il, cl)
    elif aggregation == "MrSw" and use_pallas:
        from aladin_tpu.ops.pallas.alignment_kernel import (
            mrsw_scores_bucketed,
            mrsw_scores_pallas,
        )

        if bucket_captions:
            scores = mrsw_scores_bucketed(ims, caps, il, cl, interpret=interpret,
                                          compute_dtype=compute_dtype)
        else:
            scores = mrsw_scores_pallas(ims, caps, il, cl, interpret=interpret,
                                        compute_dtype=compute_dtype)
    else:
        from aladin_tpu.ops.alignment import score_all_pairs

        n_cap = caps.shape[0]
        block = 256
        pad = (-n_cap) % block
        caps_p = jnp.pad(caps, ((0, pad), (0, 0), (0, 0)))
        cl_p = jnp.pad(cl, (0, pad), constant_values=4)
        scores = score_all_pairs(ims, caps_p, il, cl_p, aggregation, block)[:, :n_cap]

    i2t, t2i = retrieval_metrics_from_scores(scores, k, ndcg_scorer)
    return i2t, t2i, scores


def fivefold_from_scores(
    scores,
    captions_per_image: int = 5,
    n_folds: int = 5,
    ndcg_scorer=None,
) -> Tuple[Dict[str, float], Dict[str, float]]:
    """5 x 1k-fold protocol on a full (N_im, N_cap) alignment score matrix.

    The reference only applies 5-fold semantics to the matching head
    (ref:alad/recall_auxiliary.py:90-130: 5 consecutive 1k chunks of the 5k
    set, metrics averaged); this extends the identical fold layout to the
    alignment head by slicing the diagonal (images-fold x captions-fold)
    blocks of the precomputed matrix - no re-scoring per fold.
    """
    n_im = scores.shape[0]
    k = captions_per_image
    fold_im = n_im // n_folds
    scores = np.asarray(scores)
    keys = ("r1", "r5", "r10", "medr", "meanr", "ndcg_rougel", "ndcg_spice")
    acc_i2t = {key: 0.0 for key in keys}
    acc_t2i = {key: 0.0 for key in keys}
    for f in range(n_folds):
        blk = scores[f * fold_im : (f + 1) * fold_im,
                     f * fold_im * k : (f + 1) * fold_im * k]
        i2t, t2i = retrieval_metrics_from_scores(blk, k, ndcg_scorer, fold_index=f)
        for key in keys:
            acc_i2t[key] += i2t[key]
            acc_t2i[key] += t2i[key]
    return (
        {key: v / n_folds for key, v in acc_i2t.items()},
        {key: v / n_folds for key, v in acc_t2i.items()},
    )

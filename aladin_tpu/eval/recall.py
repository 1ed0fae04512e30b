"""Matching-head Recall@K over global embeddings.

Reference behavior (ref:alad/recall_auxiliary.py):
  * the embedding buffers hold 5 caption rows per image and 5 duplicate image
    rows; unique images are every 5th row (:14-15);
  * i2t: for each unique image, the rank is the BEST rank among its 5
    ground-truth captions in the descending score ordering (:34-46);
  * t2i: for each caption, the rank of its image among unique images (:47-56);
  * metrics: R@1/5/10 (% of ranks < K), medr = floor(median)+1,
    meanr = mean+1 (:60-65);
  * 5-fold 1k: the 5k set split into 5 consecutive 1k folds, metrics averaged
    (:90-130).

TPU-first: ranks are computed on device as count-of-strictly-greater
(rank(q, gt) = #{j : S[q, j] > S[q, gt]}), which is argsort-free, O(N) per
query, one fused kernel for all queries. This matches the reference's
argsort positions everywhere except exact score ties (measure-zero with
float embeddings; the reference resolves ties by buffer order).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


@functools.partial(jax.jit, static_argnames=("captions_per_image",))
def ranks_from_score_matrix(
    scores: Array, captions_per_image: int = 5
) -> Tuple[Array, Array]:
    """(i2t_ranks (N,), t2i_ranks (5N,)) from a (N_unique_images, 5N) score
    matrix with the reference's 5-captions-per-image column grouping. The
    shared rank kernel for both heads (matching dot scores, alignment MrSw
    scores) - single-chip and mesh-sharded scoring feed the same extraction.
    """
    k = captions_per_image
    n = scores.shape[0]

    # i2t: best rank among the image's 5 GT captions.
    gt_cols = jnp.arange(n)[:, None] * k + jnp.arange(k)[None, :]  # (N, 5)
    gt_scores = jnp.take_along_axis(scores, gt_cols, axis=1)  # (N, 5)
    # rank of col c for row q = #{j : S[q, j] > S[q, c]}
    greater = (scores[:, None, :] > gt_scores[:, :, None]).sum(axis=2)  # (N, 5)
    i2t_ranks = greater.min(axis=1)

    # t2i: rank of image q//5 for each caption (columns of `scores`).
    t_scores = scores.T  # (5N, N)
    gt_img = jnp.arange(t_scores.shape[0]) // k
    gt_s = jnp.take_along_axis(t_scores, gt_img[:, None], axis=1)  # (5N, 1)
    t2i_ranks = (t_scores > gt_s).sum(axis=1)

    return i2t_ranks, t2i_ranks


@functools.partial(jax.jit, static_argnames=("captions_per_image",))
def rank_metrics(
    img_embs: Array, cap_embs: Array, captions_per_image: int = 5
) -> Tuple[Array, Array]:
    """(i2t_ranks (N,), t2i_ranks (5N,)) from grouped global embeddings.

    img_embs / cap_embs: (5N, D) buffers with the reference's 5-per-image
    grouping; image rows are deduplicated internally.
    """
    k = captions_per_image
    ims = img_embs[::k]  # (N, D) unique images
    scores = jnp.matmul(ims, cap_embs.T, preferred_element_type=jnp.float32)  # (N, 5N)
    return ranks_from_score_matrix(scores, k)


def recall_metrics(ranks: np.ndarray) -> Dict[str, float]:
    """R@K / medr / meanr from a rank array (ref:recall_auxiliary.py:60-65)."""
    ranks = np.asarray(ranks)
    return {
        "r1": 100.0 * float((ranks < 1).sum()) / len(ranks),
        "r5": 100.0 * float((ranks < 5).sum()) / len(ranks),
        "r10": 100.0 * float((ranks < 10).sum()) / len(ranks),
        "medr": float(np.floor(np.median(ranks)) + 1),
        "meanr": float(ranks.mean() + 1),
    }


def _assemble(i2t_ranks, t2i_ranks) -> Dict[str, float]:
    m_i2t = recall_metrics(np.asarray(i2t_ranks))
    m_t2i = recall_metrics(np.asarray(t2i_ranks))
    out = {f"i2t_{k}": v for k, v in m_i2t.items()}
    out.update({f"t2i_{k}": v for k, v in m_t2i.items()})
    out["rsum"] = (
        m_i2t["r1"] + m_i2t["r5"] + m_i2t["r10"] + m_t2i["r1"] + m_t2i["r5"] + m_t2i["r10"]
    )
    return out


# beyond this matrix footprint compute_recall auto-engages the streaming
# counter sweep (eval/streaming.py): identical ranks (test-locked, same-K
# matmul rounding), device memory = embeddings + one tile instead of the
# (N_im, N_cap) f32 matrix. 4 GB leaves a v5e's HBM for the buffers; at
# COCO scale (5k x 25k = 500 MB) the dense path stays engaged.
STREAMING_SCORE_BYTES = 4 << 30


def compute_recall(img_embs, cap_embs, captions_per_image: int = 5) -> Dict[str, float]:
    """Both directions + rsum (ref:recall_auxiliary.py:72-86,133-148).

    Corpora whose (N_im, N_cap) f32 score matrix would exceed
    ``STREAMING_SCORE_BYTES`` stream through eval/streaming.py (exact same
    ranks, never materializing the matrix) — recall evaluation scales to
    the same corpus sizes the serving stack handles."""
    k = captions_per_image
    n_cap = int(np.shape(cap_embs)[0])
    if 4.0 * (n_cap // k) * n_cap > STREAMING_SCORE_BYTES:
        from aladin_tpu.eval.streaming import streaming_matching_recall

        return streaming_matching_recall(np.asarray(img_embs)[::k], cap_embs, k)
    return _assemble(*rank_metrics(
        jnp.asarray(img_embs), jnp.asarray(cap_embs), captions_per_image
    ))


def compute_recall_from_scores(scores, captions_per_image: int = 5) -> Dict[str, float]:
    """compute_recall from a precomputed (N_unique_images, 5N) score matrix
    (e.g. a mesh-sharded matmul from parallel.mesh.sharded_matching_scores)."""
    return _assemble(*ranks_from_score_matrix(jnp.asarray(scores), captions_per_image))


def recall_1k_5fold(img_embs, cap_embs, fold: int = 5000) -> Dict[str, float]:
    """5 x 1k folds of the 5k test set, averaged (ref:recall_auxiliary.py:90-130)."""
    keys = ("i2t_r1", "i2t_r5", "i2t_r10", "t2i_r1", "t2i_r5", "t2i_r10")
    acc = {k: 0.0 for k in keys}
    n_folds = max(len(img_embs) // fold, 1)
    fold = min(fold, len(img_embs))
    if len(img_embs) % fold:
        import logging

        logging.getLogger("vlpretrain").warning(
            "recall_1k_5fold: %d trailing rows (of %d) fall outside the "
            "%d complete folds and are excluded from the averaged metrics",
            len(img_embs) - n_folds * fold, len(img_embs), n_folds,
        )
    for i in range(n_folds):
        m = compute_recall(img_embs[i * fold : (i + 1) * fold], cap_embs[i * fold : (i + 1) * fold])
        for k in keys:
            acc[k] += m[k]
    out = {k: v / n_folds for k, v in acc.items()}
    out["rsum"] = sum(out[k] for k in keys)
    return out

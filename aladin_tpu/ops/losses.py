"""All training losses as pure functions over score matrices / embeddings.

Pure-function rebuild of the reference loss zoo (ref:alad/loss.py):
hinge triplet with hardest-negative mining, the alignment contrastive loss,
four score-distillation modes, attention distillation, the uniformity/entropy
regularizer, CLIP-style InfoNCE, the semantic contrastive loss and the
permutation-invariant matching loss (the last three are unused by shipped
configs but part of the component inventory).

Everything takes and returns f32 scalars; score matrices are (B_i, B_c) with
row = image, column = caption, diagonal = matched pairs.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from aladin_tpu.ops.alignment import alignment_scores
from aladin_tpu.ops.similarity import get_similarity


# ---------------------------------------------------------------------------
# Hinge triplet (ref:alad/loss.py:42-67)
# ---------------------------------------------------------------------------

def contrastive_hinge(scores: Array, margin: float, max_violation: bool) -> Array:
    """Bidirectional hinge triplet over a square in-batch score matrix.

    cost_s[i, j] = max(0, margin + S[i, j] - S[i, i])   (caption retrieval)
    cost_im[i, j] = max(0, margin + S[i, j] - S[j, j])  (image retrieval)
    diagonals cleared; with max_violation only the hardest negative per
    row/column survives (ref:alad/loss.py:42-67).
    """
    n = scores.shape[0]
    diag = jnp.diagonal(scores)
    cost_s = jnp.maximum(margin + scores - diag[:, None], 0.0)
    cost_im = jnp.maximum(margin + scores - diag[None, :], 0.0)
    off = ~jnp.eye(n, dtype=bool)
    cost_s = jnp.where(off, cost_s, 0.0)
    cost_im = jnp.where(off, cost_im, 0.0)
    if max_violation:
        cost_s = cost_s.max(axis=1)
        cost_im = cost_im.max(axis=0)
    return cost_s.sum() + cost_im.sum()


def matching_loss(
    im: Array,
    s: Array,
    margin: float = 0.2,
    measure: str = "dot",
    max_violation: bool = True,
) -> Tuple[Array, Array]:
    """Global-embedding triplet loss; returns (loss, B x B score matrix)
    (ref:alad/loss.py:162-186)."""
    scores = get_similarity(measure)(im, s)
    return contrastive_hinge(scores, margin, max_violation), scores


def alignment_contrastive_loss(
    im_set: Array,
    s_seq: Array,
    im_len: Array,
    s_len: Array,
    margin: float = 0.2,
    max_violation: bool = True,
    aggregation: str = "MrSw",
    normalized: bool = False,
    chunk: int = 0,
) -> Tuple[Array, Array]:
    """Fine-grained alignment triplet loss; returns (loss, score matrix)
    (ref:alad/loss.py:70-159). chunk > 0 bounds memory via the scanned +
    rematerialized scorer (ops.alignment.alignment_scores_chunked)."""
    if chunk > 0:
        from aladin_tpu.ops.alignment import alignment_scores_chunked

        scores = alignment_scores_chunked(
            im_set, s_seq, im_len, s_len, aggregation, chunk, normalized=normalized
        )
    else:
        scores = alignment_scores(
            im_set, s_seq, im_len, s_len, aggregation, normalized=normalized
        )
    return contrastive_hinge(scores, margin, max_violation), scores


# ---------------------------------------------------------------------------
# Score distillation (ref:alad/loss.py:359-447)
# ---------------------------------------------------------------------------

def distillation_mse(teacher: Array, student: Array, wb: Array) -> Array:
    """MSE with a learned affine on the student (ref:alad/loss.py:366-373).
    ``wb`` is the learnable (2,) [scale, shift], init [0.5, 0.5]."""
    student = student * wb[0] + wb[1]
    return jnp.mean(jnp.square(student - jax.lax.stop_gradient(teacher)))


def _safe_mean(x: Array, keep: Array) -> Array:
    """Mean over elements where ``keep``; 0 if none (the reference would NaN
    on an empty selection - ref:alad/loss.py:385-387)."""
    cnt = jnp.sum(keep)
    return jnp.where(cnt > 0, jnp.sum(jnp.where(keep, x, 0.0)) / jnp.maximum(cnt, 1), 0.0)


def distillation_ordinal(
    teacher: Array,
    student: Array,
    margin: float = 0.2,
    threshold: float = 0.1,
    stride: int = 3,
) -> Array:
    """Rank-order hinge: the student must reproduce the teacher's per-row /
    per-column orderings (ref:alad/loss.py:374-399)."""
    teacher = jax.lax.stop_gradient(teacher)

    def one_direction(t, s):
        order = jnp.argsort(t, axis=1)  # ascending, like torch.sort
        t_sorted = jnp.take_along_axis(t, order, axis=1)
        s_sorted = jnp.take_along_axis(s, order, axis=1)
        diffs = s_sorted[:, :-stride] - s_sorted[:, stride:]  # should be < 0
        keep = t_sorted[:, stride:] >= threshold
        return _safe_mean(jax.nn.relu(margin + diffs), keep)

    return one_direction(teacher, student) + one_direction(teacher.T, student.T)


def distillation_contrastive(teacher: Array, student: Array, margin: float = 0.2) -> Array:
    """Hinge where the hardest negative is chosen by the TEACHER
    (ref:alad/loss.py:401-425). Reproduces the reference's column/row
    ``index_select`` exactly: cost_s[i, neg_s[j]] summed over all (i, j)."""
    teacher = jax.lax.stop_gradient(teacher)
    n = teacher.shape[0]
    off = ~jnp.eye(n, dtype=bool)
    t_nodiag = jnp.where(off, teacher, 0.0)

    diag = jnp.diagonal(student)
    cost_s = jnp.maximum(margin + student - diag[:, None], 0.0)
    cost_im = jnp.maximum(margin + student - diag[None, :], 0.0)

    neg_s = jnp.argmax(t_nodiag, axis=1)  # (n,)
    neg_im = jnp.argmax(t_nodiag, axis=0)  # (n,)
    sel_s = cost_s[:, neg_s]  # (n, n): column j = cost_s[:, neg_s[j]]
    sel_im = cost_im[neg_im, :]  # (n, n): row i = cost_im[neg_im[i], :]
    return sel_s.sum() + sel_im.sum()


def distillation_listnet(
    teacher: Array, student: Array, temperature: float = 6.0, eps: float = 1e-10
) -> Array:
    """ListNet: cross-entropy between row/col softmaxes of teacher and a
    temperature-sharpened student (ref:alad/loss.py:427-445). The shipped
    default."""
    teacher = jax.lax.stop_gradient(teacher)

    def one_axis(axis):
        p = jax.nn.softmax(student * temperature, axis=axis) + eps
        q = jax.nn.softmax(teacher, axis=axis)
        return jnp.mean(-jnp.sum(q * jnp.log(p), axis=axis))

    return one_axis(1) + one_axis(0)


def distillation_loss(
    teacher: Array,
    student: Array,
    mode: str = "listnet",
    *,
    wb: Optional[Array] = None,
    margin: float = 0.2,
    threshold: float = 0.1,
    stride: int = 3,
) -> Array:
    """Dispatch over the four modes (ref:alad/loss.py:359-447)."""
    if mode == "mse":
        assert wb is not None, "mse distillation needs the learnable (2,) wb"
        return distillation_mse(teacher, student, wb)
    if mode == "ordinal":
        return distillation_ordinal(teacher, student, margin, threshold, stride)
    if mode == "contrastive":
        return distillation_contrastive(teacher, student, margin)
    if mode == "listnet":
        return distillation_listnet(teacher, student)
    raise ValueError(f"unknown distillation mode {mode!r}")


# ---------------------------------------------------------------------------
# Attention distillation (ref:alad/loss.py:273-334)
# ---------------------------------------------------------------------------

def attention_distillation_loss(
    im_set: Array,
    s_seq: Array,
    im_len: Array,
    s_len: Array,
    teacher_attentions: Array,
) -> Array:
    """KL(teacher word->region attention || student alignment softmax).

    Strips token 0 on both sides (lengths -1), scales by 1/sqrt(d), softmaxes
    the alignments over regions per word, L1-normalizes the teacher rows, and
    takes batchmean KL over real word positions (ref:alad/loss.py:277-334).
    teacher_attentions: (B_i, B_c, W_t, R_t) with W_t >= W, R_t >= R.
    """
    im_set = im_set[:, 1:, :]
    s_seq = s_seq[:, 1:, :]
    im_len = im_len - 1
    s_len = s_len - 1
    d = im_set.shape[2]
    r_len, w_len = im_set.shape[1], s_seq.shape[1]

    align = jnp.einsum("brd,cwd->bcrw", im_set, s_seq, preferred_element_type=jnp.float32)
    align = align / jnp.sqrt(jnp.asarray(d, align.dtype))
    align = jnp.transpose(align, (0, 1, 3, 2))  # (B_i, B_c, W, R)

    from aladin_tpu.ops.masking import valid_mask  # local to avoid cycle

    im_valid = valid_mask(im_len, r_len)  # (B_i, R)
    s_valid = valid_mask(s_len, w_len)  # (B_c, W)
    region_mask = im_valid[:, None, None, :]  # (B_i, 1, 1, R)

    logp = jax.nn.log_softmax(jnp.where(region_mask, align, -jnp.inf), axis=-1)
    teacher = teacher_attentions[:, :, :w_len, :r_len]
    teacher = teacher / jnp.maximum(jnp.sum(jnp.abs(teacher), axis=3, keepdims=True), 1e-30)

    word_keep = s_valid[None, :, :, None]  # (1, B_c, W, 1)
    # KL(q||p) elementwise q * (log q - log p); torch kl_div(input=logp, target=q).
    # Padded regions carry -inf log-probs; the reference path is unreachable
    # from shipped configs (SURVEY.md S2.6(7)), so we define the sane
    # semantics: contributions outside each sample's valid regions are zero.
    keep = (teacher > 0) & region_mask
    safe_logq = jnp.where(keep, jnp.log(jnp.maximum(teacher, 1e-38)), 0.0)
    kl = jnp.where(keep, teacher * (safe_logq - jnp.where(keep, logp, 0.0)), 0.0)
    kl = jnp.where(word_keep, kl, 0.0)
    # batchmean over the number of selected (b, c, w) rows
    n_rows = jnp.maximum(jnp.sum(s_valid) * im_set.shape[0], 1)
    return jnp.sum(kl) / n_rows


# ---------------------------------------------------------------------------
# Auxiliary / unused-by-shipped-configs losses (component inventory S2.1)
# ---------------------------------------------------------------------------

def entropy_uniformity_loss(img_emb: Array, cap_emb: Array) -> Array:
    """Uniformity regularizer: -log(n * dist to nearest neighbor) averaged
    over the pooled embedding set (ref:alad/alad_model.py:17-27,410-421)."""
    x = jnp.concatenate([img_emb, cap_emb], axis=0)
    n = x.shape[0]
    dots = jnp.matmul(x, x.T, preferred_element_type=jnp.float32)
    dots = jnp.where(jnp.eye(n, dtype=bool), -1.0, dots)
    nn_idx = jnp.argmax(dots, axis=1)
    dist = jnp.linalg.norm(x - x[nn_idx], axis=1)
    return -jnp.mean(jnp.log(n * dist))


def l1_hidden_regularization(hidden_img: Array, hidden_txt: Array, coef: float = 0.001) -> Array:
    """Mean L1 norm of the stacked hidden states, x 0.001
    (ref:alad/alad_model.py:221-226)."""
    l1_img = jnp.mean(jnp.sum(jnp.abs(hidden_img), axis=-1))
    l1_txt = jnp.mean(jnp.sum(jnp.abs(hidden_txt), axis=-1))
    return coef * (l1_img + l1_txt) / 2.0


def info_nce_loss(im: Array, s: Array, log_temperature: Array) -> Array:
    """CLIP-style symmetric cross-entropy with learned temperature
    (ref:alad/loss.py:190-201, CrossEntropyCriterion; unused by configs)."""
    logits = jnp.matmul(im, s.T, preferred_element_type=jnp.float32) * jnp.exp(log_temperature)
    labels = jnp.arange(im.shape[0])

    def xent(lg):
        return -jnp.mean(jax.nn.log_softmax(lg, axis=1)[labels, labels])

    return (xent(logits.T) + xent(logits)) / 2.0


def semantic_contrastive_loss(
    im: Array,
    s: Array,
    relevances: Array,
    rng: Array,
    margin: float = 0.2,
    threshold: float = 0.4,
    measure: str = "dot",
    max_violation: bool = True,
) -> Array:
    """Relevance-thresholded positives: for each row/column a random
    above-threshold entry plays the anchor-positive role
    (ref:alad/loss.py:203-270; unused by configs)."""
    scores = get_similarity(measure)(im, s)
    n = scores.shape[0]
    matching = relevances > threshold
    # Guarantee at least the diagonal is available as positive.
    matching = matching | jnp.eye(n, dtype=bool)
    kr, kc = jax.random.split(rng)

    def pick(mask_rows, key):
        # Random non-zero column per row via Gumbel-max over the mask.
        g = jax.random.gumbel(key, mask_rows.shape)
        g = jnp.where(mask_rows, g, -jnp.inf)
        return jnp.argmax(g, axis=1)

    row_pos = pick(matching, kr)  # (n,)
    col_pos = pick(matching.T, kc)  # (n,)
    d1 = scores[jnp.arange(n), row_pos][:, None]
    d2 = scores.T[jnp.arange(n), col_pos][None, :]

    cost_s = jnp.maximum(margin + scores - d1, 0.0)
    cost_im = jnp.maximum(margin + scores - d2, 0.0)
    off = ~jnp.eye(n, dtype=bool)
    cost_s = jnp.where(off, cost_s, 0.0)
    cost_im = jnp.where(off, cost_im, 0.0)
    if max_violation:
        cost_s = cost_s.max(axis=1)
        cost_im = cost_im.max(axis=0)
    return cost_s.sum() + cost_im.sum()


def perm_inv_matching_loss(im: Array, s: Array) -> Array:
    """Permutation-invariant set matching via softmin over pairwise L2
    distances (ref:alad/loss.py:338-356; unused by configs).
    im: (B, R, D), s: (B, W, D)."""
    d2 = (
        jnp.sum(im * im, axis=-1)[:, :, None]
        - 2.0 * jnp.einsum("brd,bwd->brw", im, s, preferred_element_type=jnp.float32)
        + jnp.sum(s * s, axis=-1)[:, None, :]
    )
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    row_sum = jax.nn.softmax(-dist, axis=2).max(axis=2).sum(axis=1)
    col_sum = jax.nn.softmax(-dist, axis=1).max(axis=1).sum(axis=1)
    return jnp.mean(dist.shape[1] * 2.0 - row_sum - col_sum)


# ---------------------------------------------------------------------------
# Loss combination (ref:alad/alad_model.py:442-454)
# ---------------------------------------------------------------------------

def combine_losses(
    loss_dict: Dict[str, Array],
    weights: Dict[str, float],
    auto_weights: Optional[Dict[str, Array]] = None,
) -> Array:
    """Fixed-weight sum, or uncertainty weighting 0.5 * sum(L*exp(-s) + s).

    Reference defect note (SURVEY.md S2.6): the reference's 'auto' weights are
    plain-dict nn.Parameters that never reach the optimizer, so they stay
    frozen at s=-2.3 (a constant ~10x scale). Here auto weights are genuinely
    learnable parameters owned by the train state.
    """
    if auto_weights is not None:
        total = 0.0
        for k, v in loss_dict.items():
            s = auto_weights[k]
            total = total + v * jnp.exp(-s) + s
        return 0.5 * jnp.squeeze(jnp.asarray(total))
    total = 0.0
    for k, v in loss_dict.items():
        total = total + v * weights[k]
    return jnp.asarray(total)

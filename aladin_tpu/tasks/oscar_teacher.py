"""The entangled OSCAR teacher: joint (caption, image) pair scoring.

Two reference capabilities live here:

1. ``teacher_scores``: the in-batch B x B teacher used by attention
   distillation (ref:alad/train.py:340-384 get_teacher_scores) - every
   (caption j, image i) pair runs through the JOINT encoder; the matched
   probability forms a B x B score matrix, and the last layer's head-mean
   text->region attention block is returned for AttentionDistillationLoss.
   The reference chunks by 40 pairs to dodge OOM; here a lax.scan over row
   chunks keeps one compiled program and bounded memory.

2. ``cross_scores``: the legacy OSCAR retrieval evaluation's N_img x N_cap
   pair-probability matrix (ref:oscar/run_retrieval.py:107-112,246-293
   cross_image_eval + compute_ranks) - quadratic in the corpus, the reason
   ALADIN's disentangled design exists, kept for baseline parity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from aladin_tpu.models.bert_img import ImageBertClassifier


@functools.lru_cache(maxsize=8)
def make_pair_scorer(model: ImageBertClassifier, text_len: int):
    """Returns jitted fn(params, ids, mask, seg, feats) -> (probs, att).

    probs: (N,) matched-pair probability (softmax class 1,
    ref:train.py:362-365). att: (N, text_len - 1, R) last-layer head-mean
    attention of text tokens 1..text_len over the region block
    (ref:train.py:373-377 semantics with static shapes).

    Cached per (model, text_len) — flax modules hash structurally — so the
    per-training-batch teacher call reuses one compiled program instead of
    rebuilding a fresh jit cache (and recompiling) every invocation.
    """

    @jax.jit
    def score(params, ids, mask, seg, feats):
        logits, _, _, attn = model.apply(
            {"params": params}, ids, mask, seg, feats, True, True
        )
        probs = jax.nn.softmax(logits, axis=-1)[:, 1]
        last = attn[-1].mean(axis=1)  # (N, S, S) head-mean
        att = last[:, 1:text_len, text_len:]  # text (minus CLS) -> regions
        return probs, att

    return score


def teacher_scores(
    model: ImageBertClassifier,
    params,
    pair_ids: Array,  # (B*B, L) joint streams, row-major (image major)
    pair_mask: Array,
    pair_seg: Array,
    pair_feats: Array,  # (B*B, R, F)
    batch_side: int,
    chunk: int = 64,
) -> Tuple[Array, Array]:
    """(B, B) score matrix + (B, B, W, R) teacher attentions via a scanned
    chunk loop (ref:train.py:340-384)."""
    n = pair_ids.shape[0]
    assert n == batch_side * batch_side
    assert n % chunk == 0, (n, chunk)
    text_len = pair_ids.shape[1]
    scorer = make_pair_scorer(model, text_len)

    def body(_, args):
        ids, mask, seg, feats = args
        p, a = scorer(params, ids, mask, seg, feats)
        return None, (p, a)

    chunks = n // chunk
    resh = lambda x: x.reshape(chunks, chunk, *x.shape[1:])  # noqa: E731
    _, (probs, atts) = jax.lax.scan(
        body, None, (resh(pair_ids), resh(pair_mask), resh(pair_seg), resh(pair_feats))
    )
    probs = probs.reshape(batch_side, batch_side)
    atts = atts.reshape(batch_side, batch_side, *atts.shape[2:])
    return probs, atts


def cross_scores(
    model: ImageBertClassifier,
    params,
    make_pair,  # (img_idx, cap_idx) -> (ids, mask, seg, feats) numpy
    n_images: int,
    n_captions: int,
    chunk: int = 64,
):
    """Full N_img x N_cap matched-probability matrix, streamed host-side
    (the pair streams cannot pre-materialize: N*M joint encodings). Used by
    the legacy-retrieval baseline (tasks/retrieval_oscar.py)."""
    import numpy as np

    first = make_pair(0, 0)
    text_len = first[0].shape[0]
    scorer = make_pair_scorer(model, text_len)
    out = np.zeros((n_images, n_captions), np.float32)
    pairs = [(i, c) for i in range(n_images) for c in range(n_captions)]
    for s in range(0, len(pairs), chunk):
        batch = pairs[s : s + chunk]
        ids, mask, seg, feats = (
            np.stack(x) for x in zip(*(make_pair(i, c) for i, c in batch))
        )
        probs, _ = scorer(params, jnp.asarray(ids), jnp.asarray(mask),
                          jnp.asarray(seg), jnp.asarray(feats))
        probs = np.asarray(probs)
        for (i, c), p in zip(batch, probs):
            out[i, c] = p
    return out

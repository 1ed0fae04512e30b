"""Legacy OSCAR cross-modal retrieval task (the entangled baseline).

Equivalent capability to ref:oscar/run_retrieval.py: joint (caption, image)
pair CLASSIFICATION - training samples a random in-dataset negative per
positive (:210-225), evaluation scores N x N pairs through the joint encoder
(cross_image_eval :107-112,246-248) and computes ranks from the pair
probabilities (:264-293). This is the pipeline that produced the OSCAR/VinVL
baseline numbers ALADIN distills from; it is quadratic at retrieval time -
the motivation for ALADIN's disentangled design.

TPU-first shape: the pair classifier step is one jitted function (CE loss
over {mismatched, matched}); evaluation reuses tasks/oscar_teacher.py's
streamed pair scorer.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aladin_tpu.models.bert_img import ImageBertClassifier


def make_pair_train_step(model: ImageBertClassifier, tx: optax.GradientTransformation,
                         loss_type: str = "ce"):
    """Jitted step over (ids, mask, seg, feats, labels) pair batches
    (ref:run_retrieval.py:316-417 semantics; 'ce' is the retrieval default)."""

    def loss_fn(params, ids, mask, seg, feats, labels, rng):
        logits, _, _, _ = model.apply(
            {"params": params}, ids, mask, seg, feats, False, False,
            rngs={"dropout": rng},
        )
        if loss_type == "ce":
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        elif loss_type == "bce":
            onehot = jax.nn.one_hot(labels, logits.shape[-1])
            loss = optax.sigmoid_binary_cross_entropy(logits, onehot).mean() * logits.shape[-1]
        else:
            raise ValueError(loss_type)
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return loss, acc

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, ids, mask, seg, feats, labels, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, ids, mask, seg, feats, labels, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "acc": acc}

    return step


def sample_pairs(dataset, indices, rng: np.random.RandomState):
    """Positive + random negative per index (ref:run_retrieval.py:210-225):
    with p=0.5 a random caption from another image, else a random other
    image with the anchor caption. Returns stacked joint streams + labels."""
    ids_l, mask_l, seg_l, feats_l, labels = [], [], [], [], []
    n_img = len(dataset.img_keys)
    ncpi = dataset.num_captions_per_img
    for index in indices:
        img_idx = index // ncpi
        cap_idx = index % ncpi
        key = dataset.img_keys[img_idx]
        feats = dataset.get_image(key)
        caption = dataset.captions[key][cap_idx]
        od = dataset.get_od_labels(key)
        pos = dataset.tensorizer.tensorize_joint(caption, od, feats)

        neg_img_idx = rng.randint(n_img - 1)
        if neg_img_idx >= img_idx:
            neg_img_idx += 1
        if rng.rand() <= 0.5:
            neg_cap = dataset.captions[dataset.img_keys[neg_img_idx]][rng.randint(ncpi)]
            neg = dataset.tensorizer.tensorize_joint(neg_cap, od, feats)
        else:
            neg_key = dataset.img_keys[neg_img_idx]
            neg = dataset.tensorizer.tensorize_joint(
                caption, dataset.get_od_labels(neg_key), dataset.get_image(neg_key)
            )
        for ex, lab in ((pos, 1), (neg, 0)):
            ids_l.append(ex[0]); mask_l.append(ex[1]); seg_l.append(ex[2])
            feats_l.append(ex[3]); labels.append(lab)
    return (
        np.stack(ids_l), np.stack(mask_l), np.stack(seg_l),
        np.stack(feats_l).astype(np.float32), np.asarray(labels, np.int64),
    )


def ranks_from_pair_probs(probs: np.ndarray, captions_per_image: int = 5):
    """i2t/t2i ranks from the (N_img, N_img * cpi) pair-probability matrix
    (ref:run_retrieval.py:264-293 compute_ranks semantics). The matrix has
    exactly the (N_im, N_cap) contract of eval/recall.py's fused rank
    kernel, so delegate (count-greater tie semantics, documented there)
    instead of an O(N^2 log N) host argsort loop."""
    from aladin_tpu.eval.recall import ranks_from_score_matrix

    i2t, t2i = ranks_from_score_matrix(np.asarray(probs), captions_per_image)
    return np.asarray(i2t), np.asarray(t2i)


def evaluate_cross(model, params, dataset, chunk: int = 64) -> Dict[str, float]:
    """cross_image_eval -> R@K both directions (legacy baseline protocol)."""
    from aladin_tpu.eval.recall import recall_metrics
    from aladin_tpu.tasks.oscar_teacher import cross_scores

    keys = dataset.img_keys
    ncpi = dataset.num_captions_per_img
    feats = {k: dataset.get_image(k) for k in keys}
    ods = {k: dataset.get_od_labels(k) for k in keys}

    def make_pair(i, c):
        key_i = keys[i]
        key_c = keys[c // ncpi]
        caption = dataset.captions[key_c][c % ncpi]
        ex = dataset.tensorizer.tensorize_joint(caption, ods[key_i], feats[key_i])
        return ex[0], ex[1], ex[2], ex[3]

    probs = cross_scores(model, params, make_pair, len(keys), len(keys) * ncpi, chunk)
    i2t, t2i = ranks_from_pair_probs(probs, ncpi)
    m1, m2 = recall_metrics(i2t), recall_metrics(t2i)
    out = {f"i2t_{k}": v for k, v in m1.items()}
    out.update({f"t2i_{k}": v for k, v in m2.items()})
    out["rsum"] = m1["r1"] + m1["r5"] + m1["r10"] + m2["r1"] + m2["r5"] + m2["r10"]
    return out

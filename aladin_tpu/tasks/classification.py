"""VQA / GQA / NLVR2 classification tasks over the cross-modal backbone.

Equivalent capability to ref:oscar/run_vqa.py / run_gqa.py / run_nlvr.py:

  * VQA: 3129-way answer classification over the joint (question, regions)
    stream; losses bce (instance BCE x n_labels, ref:modeling_bert.py:282-287
    + :348-349), kl (soft answer scores, :341-347) or ce;
  * GQA: single-answer CE over the same encoder;
  * NLVR2: two images per example - pair-choice over concatenated pooled
    outputs (ImageBertForMultipleChoice semantics,
    ref:modeling_bert.py:357-467 capability).

All three reduce to jitted (loss, step, predict) triples over
ImageBertClassifier; the input streams come from the joint tensorizer.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax import Array

from aladin_tpu.models.bert_img import BertImgConfig, BertImgModel, ImageBertClassifier, _dense_init


def classification_loss(logits: Array, labels: Array, loss_type: str = "ce") -> Array:
    """ce: integer labels; bce: multi-hot soft targets scaled by n_labels
    (instance_bce_with_logits, ref:modeling_bert.py:282-287); kl: soft
    scores vs log-softmax (ref:modeling_bert.py:341-347)."""
    if loss_type == "ce":
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    if loss_type == "bce":
        per = optax.sigmoid_binary_cross_entropy(logits, labels)
        return per.mean() * labels.shape[1]
    if loss_type == "kl":
        logp = jax.nn.log_softmax(logits, axis=-1)
        q = labels
        q_logq = jnp.where(q > 0, q * jnp.log(jnp.maximum(q, 1e-38)), 0.0)
        return jnp.sum(q_logq - q * logp) / logits.shape[0]  # batchmean
    raise ValueError(loss_type)


def make_classifier_train_step(model: ImageBertClassifier, tx: optax.GradientTransformation,
                               loss_type: str = "bce"):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, ids, mask, seg, feats, labels, rng):
        def loss_fn(p):
            logits, _, _, _ = model.apply(
                {"params": p}, ids, mask, seg, feats, False, False,
                rngs={"dropout": rng},
            )
            loss = classification_loss(logits, labels, loss_type)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "logits": logits}

    return step


def make_predict_step(model: ImageBertClassifier):
    @jax.jit
    def predict(params, ids, mask, seg, feats):
        logits, _, _, _ = model.apply({"params": params}, ids, mask, seg, feats, True, False)
        return jnp.argmax(logits, axis=-1), jax.nn.softmax(logits, axis=-1)

    return predict


def vqa_score(logits: Array, soft_targets: Array) -> Array:
    """The VQA accuracy surrogate: score of the argmax answer under the
    soft target distribution (ref:run_vqa.py compute_score_with_logits
    capability)."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.take_along_axis(soft_targets, pred[:, None], axis=1).mean()


class ImageBertForMultipleChoice(nn.Module):
    """NLVR2 pair-choice head (ref:modeling_bert.py:357-467): each choice's
    (statement, image) stream encodes independently; pooled outputs
    CONCATENATE across choices -> one classifier over num_choices*hidden
    ('linear' or 'mlp' head, ref:modeling_bert.py:375-394)."""

    cfg: BertImgConfig
    num_choices: int = 2
    num_labels: int = 2
    classifier: str = "mlp"
    cls_hidden_scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids, mask, seg, feats, deterministic: bool = True) -> Array:
        """ids/mask/seg/feats: (B, num_choices, ...) stacked choice streams."""
        b, c = ids.shape[:2]
        flat = lambda x: x.reshape(b * c, *x.shape[2:])  # noqa: E731
        backbone = BertImgModel(self.cfg, self.dtype, name="bert")
        _, pooled, _, _ = backbone(flat(ids), flat(mask), flat(seg), flat(feats), deterministic)
        pooled = nn.Dropout(self.cfg.hidden_dropout_prob)(pooled, deterministic=deterministic)
        pooled = pooled.reshape(b, c * self.cfg.hidden_size)
        if self.classifier == "linear":
            return nn.Dense(self.num_labels, dtype=self.dtype,
                            kernel_init=_dense_init(self.cfg), name="cls")(pooled)
        h = nn.Dense(self.cfg.hidden_size * self.cls_hidden_scale, dtype=self.dtype,
                     kernel_init=_dense_init(self.cfg), name="cls_fc1")(pooled)
        return nn.Dense(self.num_labels, dtype=self.dtype,
                        kernel_init=_dense_init(self.cfg), name="cls_fc2")(jax.nn.relu(h))


class OscarForMultipleChoice(nn.Module):
    """Per-choice scorer (ref:modeling_bert.py:470-572): each choice stream
    encodes AND classifies independently -> (B, num_choices, num_labels)
    logits (the reference reshapes to (B*C, num_labels) for its bce/ce
    losses). 'linear' head = Dense(hidden, 2); 'mlp' adds the
    cls_hidden_scale bottleneck."""

    cfg: BertImgConfig
    num_labels: int = 2
    classifier: str = "linear"
    cls_hidden_scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids, mask, seg, feats, deterministic: bool = True) -> Array:
        b, c = ids.shape[:2]
        flat = lambda x: x.reshape(b * c, *x.shape[2:])  # noqa: E731
        backbone = BertImgModel(self.cfg, self.dtype, name="bert")
        _, pooled, _, _ = backbone(flat(ids), flat(mask), flat(seg), flat(feats), deterministic)
        pooled = nn.Dropout(self.cfg.hidden_dropout_prob)(pooled, deterministic=deterministic)
        if self.classifier == "mlp":
            h = nn.Dense(self.cfg.hidden_size * self.cls_hidden_scale, dtype=self.dtype,
                         kernel_init=_dense_init(self.cfg), name="cls_fc1")(pooled)
            logits = nn.Dense(self.num_labels, dtype=self.dtype,
                              kernel_init=_dense_init(self.cfg), name="cls_fc2")(jax.nn.relu(h))
        else:
            logits = nn.Dense(self.num_labels, dtype=self.dtype,
                              kernel_init=_dense_init(self.cfg), name="cls")(pooled)
        return logits.reshape(b, c, self.num_labels)

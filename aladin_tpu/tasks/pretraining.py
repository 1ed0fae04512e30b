"""OSCAR+ pretraining: masked LM + contrastive sequence relation.

Behavioral contract (ref:oscar/modeling/modeling_bert.py:927-1020
BertImgForPreTraining, ref:oscar/datasets/oscar_tsv.py:619-659 random_word,
ref:oscar/run_oscarplus_pretrain.py):

  * heads: tied-embedding MLM + a Linear(hidden, num_contrast_classes)
    sequence-relation classifier over the pooled CLS;
  * loss = CE(masked positions, ignore_index=-1) + CE(seq relation);
  * masking: each text token is masked with p=0.15 -> 80% [MASK] / 10%
    random / 10% kept, label = original id, else label -1;
  * the "contrastive" signal: with p=0.5 the tag/OD-label segment is
    swapped for another image's, label 1 (polluted) vs 0 (matched).

TPU-first: the train step is one jitted function; data parallelism is the
same (dp, tp) mesh the retrieval trainer uses - the reference's
DDP/all_reduce (ref:run_oscarplus_pretrain.py:175,316-318,477-478) becomes
XLA collectives emitted from batch sharding.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from aladin_tpu.models.bert_img import BertImgConfig, BertImgModel, _dense_init
from aladin_tpu.tasks.captioning import BertMLMHead


class BertImgForPreTraining(nn.Module):
    cfg: BertImgConfig
    num_contrast_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids, img_feats,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        backbone = BertImgModel(self.cfg, self.dtype, name="bert")
        seq, pooled, _, _ = backbone(
            input_ids, attention_mask, token_type_ids, img_feats, deterministic
        )
        text_len = input_ids.shape[1]
        word_emb = self.variables["params"]["bert"]["word_embeddings"]["embedding"]
        mlm_logits = BertMLMHead(self.cfg, self.dtype, name="cls")(seq[:, :text_len], word_emb)
        rel_logits = nn.Dense(self.num_contrast_classes, dtype=self.dtype,
                              kernel_init=_dense_init(self.cfg), name="seq_relationship")(pooled)
        return mlm_logits, rel_logits


def pretraining_loss(mlm_logits: Array, rel_logits: Array,
                     masked_lm_labels: Array, next_sentence_label: Array):
    """CE(ignore_index=-1) + CE, exactly the reference composition.

    ``masked_lm_labels`` may carry the reference's full-stream layout (text
    labels then -1 over every image slot, ref:oscar_tsv.py:758); the MLM
    head only scores text positions, and the image-slot labels are -1 by
    construction, so the tail is sliced off here."""
    v = mlm_logits.shape[-1]
    labels = masked_lm_labels[:, : mlm_logits.shape[1]].reshape(-1)
    logits = mlm_logits.reshape(-1, v)
    active = labels >= 0
    safe = jnp.maximum(labels, 0)
    per_tok = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
    mlm = jnp.sum(jnp.where(active, per_tok, 0.0)) / jnp.maximum(jnp.sum(active), 1)
    rel = optax.softmax_cross_entropy_with_integer_labels(
        rel_logits, next_sentence_label
    ).mean()
    return mlm + rel, mlm, rel


def make_pretrain_step(model: BertImgForPreTraining, tx: optax.GradientTransformation):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, ids, mask, seg, feats, mlm_labels, rel_labels, rng):
        def loss_fn(p):
            mlm_logits, rel_logits = model.apply(
                {"params": p}, ids, mask, seg, feats, False, rngs={"dropout": rng}
            )
            total, mlm, rel = pretraining_loss(mlm_logits, rel_logits, mlm_labels, rel_labels)
            return total, {"loss": total, "mlm_loss": mlm, "rel_loss": rel}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def random_word_mask(token_ids: np.ndarray, vocab_size: int, rng: np.random.RandomState,
                     mask_id: int, special_ids=(0,), prob: float = 0.15):
    """BERT masking over a 1-D id array (ref:oscar_tsv.py:619-659):
    p=0.15 per token -> 80% [MASK] / 10% random / 10% keep; labels hold the
    original id at masked positions, -1 elsewhere. ``special_ids`` ([PAD]
    etc.) are never masked."""
    ids = token_ids.copy()
    labels = np.full_like(ids, -1, dtype=np.int64)
    for i, tok in enumerate(ids):
        if tok in special_ids:
            continue
        if rng.rand() < prob:
            labels[i] = tok
            r = rng.rand()
            if r < 0.8:
                ids[i] = mask_id
            elif r < 0.9:
                ids[i] = rng.randint(vocab_size)
            # else keep
    return ids, labels


def pollute_tags(tag_ids_batch: np.ndarray, rng: np.random.RandomState,
                 prob: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """With p=prob swap an example's tag segment for another example's
    (label 1 = polluted), the QA/contrastive signal of OSCAR+ pretraining."""
    n = tag_ids_batch.shape[0]
    out = tag_ids_batch.copy()
    labels = np.zeros(n, np.int64)
    for i in range(n):
        if rng.rand() < prob and n > 1:
            j = rng.randint(n - 1)
            if j >= i:
                j += 1
            out[i] = tag_ids_batch[j]
            labels[i] = 1
    return out, labels

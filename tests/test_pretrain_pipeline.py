"""Pretraining pipeline: multi-corpus dataset -> train step -> driver.

Covers the capability of ref:oscar/datasets/oscar_tsv.py (corpus layout,
random_sent labels, convert_example_to_features stream layout) and
ref:oscar/run_oscarplus_pretrain.py (driver: AdamW + warmup-linear,
checkpointing), per VERDICT r1 missing #3 / next-step #7a.
"""

import os

import numpy as np
import pytest

from aladin_tpu.cli.common import build_tokenizer
from aladin_tpu.config import DataArgs
from aladin_tpu.tasks.pretrain_data import PretrainCorpus, make_synthetic_pretrain_corpus


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pretrain"))
    make_synthetic_pretrain_corpus(root, ("coco", "flickr30k"), n_images_per_dataset=6,
                                   feat_dim=16)
    return root


@pytest.fixture(scope="module")
def tokenizer():
    return build_tokenizer(DataArgs())


def make_corpus(corpus_root, tokenizer, **kw):
    kw.setdefault("seq_len", 24)
    kw.setdefault("max_img_seq_length", 8)
    kw.setdefault("img_feature_dim", 16)
    return PretrainCorpus(corpus_root, tokenizer, ("coco", "flickr30k"), **kw)


def test_corpus_layout_and_example(corpus_root, tokenizer):
    c = make_corpus(corpus_root, tokenizer)
    assert len(c) == 12  # 6 per dataset, both selected
    v = tokenizer.vocab
    ex = c.example(0)
    assert ex["input_ids"].shape == (24,)
    assert ex["attention_mask"].shape == (24 + 8,)
    assert ex["lm_labels"].shape == (24 + 8,)
    assert ex["img_feats"].shape == (8, 16)
    assert ex["input_ids"][0] == v["[CLS]"]
    # [SEP] closes text_a (segment 0) and text_b (segment 1)
    seps = np.where(ex["input_ids"] == v["[SEP]"])[0]
    assert len(seps) == 2
    assert ex["token_type_ids"][seps[0]] == 0 and ex["token_type_ids"][seps[1]] == 1
    # lm labels: -1 on specials/pads and every image slot
    assert ex["lm_labels"][0] == -1
    assert (ex["lm_labels"][24:] == -1).all()
    # masked positions carry the original id as label
    masked = ex["lm_labels"][:24] >= 0
    if masked.any():
        assert (ex["lm_labels"][:24][masked] < len(v)).all()

    # deterministic per (epoch, index); different across epochs
    e0a, e0b, e1 = c.example(3, 0), c.example(3, 0), c.example(3, 1)
    np.testing.assert_array_equal(e0a["input_ids"], e0b["input_ids"])
    diff = any(
        not np.array_equal(c.example(i, 0)["input_ids"], c.example(i, 1)["input_ids"])
        for i in range(len(c))
    )
    assert diff


def test_corpus_dataset_filter(corpus_root, tokenizer):
    only = PretrainCorpus(corpus_root, tokenizer, ("coco",), seq_len=24,
                          max_img_seq_length=8, img_feature_dim=16)
    assert len(only) == 6
    assert all(r[0].startswith("coco_") for r in only.rows)


def test_contrast_label_semantics(corpus_root, tokenizer):
    # default: labels in {0 matched, 1 polluted-text_b}
    c = make_corpus(corpus_root, tokenizer)
    labels = {int(c.example(i, e)["is_next"]) for i in range(len(c)) for e in range(6)}
    assert labels == {0, 1}
    # texta_false_prob=0.5, 3 classes: non-matches are all wrong-text_a (2)
    c3 = make_corpus(corpus_root, tokenizer, texta_false_prob=0.5,
                     num_contrast_classes=3)
    labels3 = {int(c3.example(i, e)["is_next"]) for i in range(len(c3)) for e in range(6)}
    assert labels3 <= {0, 2} and 2 in labels3
    # texta_false_prob=0.5 with a 2-logit head: labels must stay in {0, 1}.
    # Regression: the is_next_type remap (a mask-gating value, never the
    # loss label in the reference) was fed to the head, whose CE over 2
    # logits returns NaN for label 2.
    c2 = make_corpus(corpus_root, tokenizer, texta_false_prob=0.5,
                     num_contrast_classes=2)
    labels2 = {int(c2.example(i, e)["is_next"]) for i in range(len(c2)) for e in range(8)}
    assert labels2 == {0, 1}, labels2


def test_pretrain_step_learns(corpus_root, tokenizer):
    """data -> jitted step: loss decreases on a repeated batch."""
    import jax

    from aladin_tpu.cli.pretrain import make_optimizer
    from aladin_tpu.models.bert_img import BertImgConfig
    from aladin_tpu.tasks.pretraining import BertImgForPreTraining, make_pretrain_step

    c = make_corpus(corpus_root, tokenizer)
    b = c.collate(list(range(8)))
    cfg = BertImgConfig(vocab_size=tokenizer.vocab_size, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, max_position_embeddings=64,
                        img_feature_dim=16)
    model = BertImgForPreTraining(cfg)
    params = model.init(jax.random.PRNGKey(0), b["input_ids"], b["attention_mask"],
                        b["token_type_ids"], b["img_feats"])["params"]
    tx, _ = make_optimizer(2e-3, warmup_steps=0, t_total=10_000)
    opt_state = tx.init(params)
    step = make_pretrain_step(model, tx)
    losses = []
    for i in range(8):
        params, opt_state, m = step(
            params, opt_state, b["input_ids"], b["attention_mask"],
            b["token_type_ids"], b["img_feats"], b["lm_labels"], b["is_next"],
            jax.random.PRNGKey(1),
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_no_decay_mask_targets_bias_and_layernorm():
    import jax
    import jax.numpy as jnp

    from aladin_tpu.cli.pretrain import make_optimizer

    tx, _ = make_optimizer(1e-3, 0, 100)
    # the REAL flax module names (models/bert_img.py): *_layernorm —
    # regression: the mask once matched only 'layer_norm'/'LayerNorm'
    params = {
        "dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
        "layer_norm": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))},
        "attention_layernorm": {"scale": jnp.ones((2,))},
        "embeddings_layernorm": {"scale": jnp.ones((2,))},
    }
    # one update with zero grads: decayed leaves shrink, no-decay stay put
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)
    assert float(new["dense"]["kernel"][0, 0]) < 1.0
    assert float(new["dense"]["bias"][0]) == 1.0
    assert float(new["layer_norm"]["scale"][0]) == 1.0
    assert float(new["attention_layernorm"]["scale"][0]) == 1.0
    assert float(new["embeddings_layernorm"]["scale"][0]) == 1.0


@pytest.mark.slow
def test_pretrain_cli_e2e(tmp_path):
    from aladin_tpu.cli.pretrain import main

    out = str(tmp_path / "run")
    rc = main(["--synthetic", "--max_iters", "10", "--train_batch_size", "8",
               "--log_step", "5", "--ckpt_period", "5", "--output_dir", out,
               "--img_feature_dim", "16", "--max_seq_length", "24",
               "--max_img_seq_length", "8", "--warmup_steps", "2"])
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "ckpt_0000005"))
    assert os.path.isdir(os.path.join(out, "ckpt_0000010"))
    log = open(os.path.join(out, "log.txt")).read()
    assert "iter 10/10" in log and "mlm_loss" in log

"""The real-checkpoint entry path: a synthetic OSCAR/VinVL checkpoint
DIRECTORY (pytorch_model.bin + config.json + vocab.txt + training_args.bin)
drives tokenizer loading, flag overrides, backbone conversion/grafting and
the full train CLI - exactly what a user with the released VinVL checkpoint
does (ref:alad/train.py:205-213)."""

import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aladin_tpu.data.dataset import make_synthetic_dataset

VOCAB_WORDS = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a the of photo number dog cat car tree "
    "person boat bird house 0 1 2 3 4 5 6 7 8 9"
).split()


@pytest.fixture(scope="module")
def oscar_dir(tmp_path_factory):
    """Build a tiny but structurally-faithful OSCAR checkpoint dir."""
    d = tmp_path_factory.mktemp("vinvl_ckpt")
    cfg = {
        "vocab_size": len(VOCAB_WORDS),
        "hidden_size": 32,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "intermediate_size": 64,
        "max_position_embeddings": 64,
        "type_vocab_size": 2,
        "layer_norm_eps": 1e-12,
        "img_feature_dim": 32,
        "img_feature_type": "frcnn",
        "use_img_layernorm": 1,
        "img_layer_norm_eps": 1e-5,
        "num_labels": 2,
        "hidden_dropout_prob": 0.1,
        "attention_probs_dropout_prob": 0.1,
    }
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    with open(d / "vocab.txt", "w") as f:
        f.write("\n".join(VOCAB_WORDS) + "\n")

    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    hf = BertModel(BertConfig(
        vocab_size=cfg["vocab_size"], hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    ))
    sd = {f"bert.{k}": v for k, v in hf.state_dict().items()}
    sd["bert.img_embedding.weight"] = torch.randn(32, 32)
    sd["bert.img_embedding.bias"] = torch.randn(32)
    sd["bert.LayerNorm.weight"] = torch.ones(32)
    sd["bert.LayerNorm.bias"] = torch.zeros(32)
    sd["classifier.weight"] = torch.randn(2, 32)
    sd["classifier.bias"] = torch.zeros(2)
    torch.save(sd, d / "pytorch_model.bin")

    import argparse

    train_args = argparse.Namespace(  # the Namespace the reference pickles
        do_lower_case=True, img_feature_type="frcnn", add_od_labels=True,
        od_label_type="vg", use_img_layernorm=1, img_layer_norm_eps=1e-5,
    )
    torch.save(train_args, d / "training_args.bin")
    return str(d)


def test_load_oscar_checkpoint_dir(oscar_dir):
    from aladin_tpu.io.convert import load_oscar_checkpoint

    tree, bert_cfg = load_oscar_checkpoint(oscar_dir)
    assert bert_cfg.hidden_size == 32
    assert bert_cfg.img_layer_norm_eps == 1e-5
    assert "word_embeddings" in tree["oscar"]
    assert tree["oscar"]["img_embedding"]["kernel"].shape == (32, 32)
    assert tree["classifier"]["kernel"].shape == (32, 2)


def test_grafted_backbone_matches_hf(oscar_dir, rng):
    """Text-only forward through the grafted params == HF with the same bin."""
    from transformers import BertModel

    from aladin_tpu.io.convert import load_oscar_checkpoint
    from aladin_tpu.models.bert_img import BertImgModel

    tree, bert_cfg = load_oscar_checkpoint(oscar_dir)
    model = BertImgModel(bert_cfg)
    ids = rng.randint(3, bert_cfg.vocab_size, size=(2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    seq, _, _, _ = model.apply(
        {"params": tree["oscar"]}, jnp.array(ids), jnp.array(mask),
        jnp.zeros((2, 9), jnp.int32), None, True,
    )

    hf = BertModel.from_pretrained(
        oscar_dir, attn_implementation="eager", add_pooling_layer=True
    )
    hf.eval()
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state
    np.testing.assert_allclose(np.asarray(seq), ref.numpy(), atol=3e-5)


@pytest.mark.slow
def test_full_cli_with_oscar_dir(oscar_dir, tmp_path):
    """Train one epoch with --eval_model_dir: tokenizer from vocab.txt,
    training_args.bin overrides (img_layer_norm_eps 1e-5), grafted backbone."""
    from aladin_tpu.cli.train import main as train_main

    data_root = str(tmp_path / "coco_ir")
    make_synthetic_dataset(data_root, n_images=8, feat_dim=32)  # >= bs samples
    rc = train_main([
        "--config", "aladin_tpu/configs/alad-matching-triplet-finetune.yaml",
        "--data_dir", data_root,
        "--img_feat_file", os.path.join(data_root, "features.tsv"),
        "--eval_model_dir", oscar_dir,
        "--output_dir", str(tmp_path), "--logger_name", str(tmp_path / "runs"),
        "--max_seq_length", "16", "--max_img_seq_length", "10",
        "--img_feature_dim", "32", "--num_epochs", "1", "--val_step", "0",
        "--log_step", "100",
    ])
    assert rc == 0
    assert os.path.isdir(tmp_path / "runs" / "model_best_rsum")

"""Captioning pipeline e2e: train masked-caption LM -> decode -> caption
metrics, through the driver (the run_captioning.py capability; VERDICT r1
missing #3 / next-step #7c)."""

import json
import os

import numpy as np
import pytest

from aladin_tpu.cli.captioning import detokenize, gather_masked, masked_positions
from aladin_tpu.data.tokenizer import BertWordPieceTokenizer

VOCAB = {t: i for i, t in enumerate(
    "[PAD] [UNK] [CLS] [SEP] [MASK] a the dog ##gy runs".split()
)}


def test_masked_positions_padding():
    mpos = np.array([[0, 1, 0, 1, 0], [0, 0, 0, 0, 0]], np.int32)
    out = masked_positions(mpos, 3)
    np.testing.assert_array_equal(out, [[1, 3, 0], [0, 0, 0]])


def test_gather_masked_shapes():
    import jax.numpy as jnp

    logits = jnp.arange(2 * 4 * 5, dtype=jnp.float32).reshape(2, 4, 5)
    midx = jnp.array([[1, 3], [0, 0]], jnp.int32)
    out = gather_masked(logits, midx)
    assert out.shape == (4, 5)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(logits[0, 1]))


def test_detokenize_wordpiece_and_sep():
    tok = BertWordPieceTokenizer(VOCAB)
    v = VOCAB
    rows = np.array([
        [v["[CLS]"], v["the"], v["dog"], v["##gy"], v["runs"], v["[SEP]"], v["the"]],
        [v["a"], v["[SEP]"], v["dog"], 0, 0, 0, 0],
    ])
    assert detokenize(tok, rows) == ["the doggy runs", "a"]


@pytest.mark.slow
def test_captioning_driver_e2e(tmp_path):
    """data -> train -> greedy decode -> BLEU/ROUGE/CIDEr; the model must
    actually learn the synthetic captions (strong metric floors)."""
    from aladin_tpu.cli.captioning import main

    out = str(tmp_path / "cap")
    rc = main(["--synthetic", "--epochs", "6", "--train_batch_size", "8",
               "--max_seq_length", "24", "--max_seq_a_length", "12",
               "--max_img_seq_length", "8", "--img_feature_dim", "16",
               "--learning_rate", "3e-3", "--output_dir", out])
    assert rc == 0
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["Bleu_1"] > 0.5, metrics
    assert metrics["CIDEr"] > 0.2, metrics
    preds = json.load(open(os.path.join(out, "predictions.json")))
    assert len(preds) == 8 and all(p["caption"] for p in preds)


@pytest.mark.slow
def test_captioning_driver_beam(tmp_path):
    from aladin_tpu.cli.captioning import main

    out = str(tmp_path / "beam")
    rc = main(["--synthetic", "--epochs", "4", "--train_batch_size", "8",
               "--max_seq_length", "24", "--max_seq_a_length", "12",
               "--max_img_seq_length", "8", "--img_feature_dim", "16",
               "--learning_rate", "3e-3", "--num_beams", "3",
               "--output_dir", out])
    assert rc == 0
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["Bleu_1"] > 0.3, metrics

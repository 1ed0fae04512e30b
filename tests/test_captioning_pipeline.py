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


def test_token_logprobs_match_greedy(rng=np.random.RandomState(0)):
    """The differentiable SCST evaluation pass reproduces the decoder's own
    logprob: token_logprobs(greedy tokens) summed over the mask == the
    logprob greedy_decode reported."""
    import jax
    import jax.numpy as jnp

    from aladin_tpu.tasks.captioning import (
        BertImageCaptioner,
        _decode_attention_mask,
        greedy_decode,
        token_logprobs,
    )
    from tests.test_models import small_cfg

    tok = BertWordPieceTokenizer(VOCAB)
    cfg = small_cfg()
    model = BertImageCaptioner(cfg)
    b, max_seq_a, od_len, img_len = 2, 6, 4, 3
    max_seq = max_seq_a + od_len
    od_ids = jnp.array(rng.randint(5, len(VOCAB), (b, od_len)).astype(np.int32))
    od_seg = jnp.ones((b, od_len), jnp.int32)
    feats = jnp.array(rng.randn(b, img_len, cfg.img_feature_dim).astype(np.float32))
    mask = jnp.array(np.broadcast_to(
        _decode_attention_mask(max_seq_a, max_seq, img_len, od_len, img_len),
        (b, max_seq + img_len, max_seq + img_len)))
    ids0 = jnp.concatenate(
        [jnp.full((b, max_seq_a), VOCAB["[MASK]"], jnp.int32), od_ids], axis=1)
    params = model.init(jax.random.PRNGKey(0), ids0, mask, jnp.zeros_like(ids0),
                        feats, True)["params"]

    common = dict(max_steps=max_seq_a - 1, cls_id=VOCAB["[CLS]"],
                  sep_id=VOCAB["[SEP]"], mask_id=VOCAB["[MASK]"], pad_id=VOCAB["[PAD]"])
    toks, logp = greedy_decode(model, params, od_ids, od_seg, feats, mask, **common)
    lps, tmask = token_logprobs(model, params, toks, od_ids, od_seg, feats, mask,
                                mask_id=VOCAB["[MASK]"], pad_id=VOCAB["[PAD]"])
    np.testing.assert_allclose(np.asarray((lps * tmask).sum(1)), np.asarray(logp),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_scst_driver_e2e(tmp_path):
    from aladin_tpu.cli.captioning import main

    out = str(tmp_path / "scst")
    rc = main(["--synthetic", "--epochs", "4", "--scst_epochs", "2",
               "--scst_lr", "1e-5", "--train_batch_size", "8",
               "--max_seq_length", "24", "--max_seq_a_length", "12",
               "--max_img_seq_length", "8", "--img_feature_dim", "16",
               "--learning_rate", "3e-3", "--output_dir", out])
    assert rc == 0
    log = open(os.path.join(out, "log.txt")).read()
    assert "scst epoch 1" in log and "mean-advantage" in log


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
def test_cbs_driver_e2e(tmp_path):
    """--use_cbs: decoding constrained on detection-derived FSMs; every
    caption must contain at least one of its image's detected class words
    (min 2 constraints clipped by the per-image constraint count)."""
    import json as _json

    from aladin_tpu.cli.captioning import main
    from aladin_tpu.tasks.task_inputs import ImageFeatureProvider

    out = str(tmp_path / "cbs")
    rc = main(["--synthetic", "--epochs", "4", "--use_cbs",
               "--train_batch_size", "8", "--max_seq_length", "24",
               "--max_seq_a_length", "12", "--max_img_seq_length", "8",
               "--img_feature_dim", "16", "--learning_rate", "3e-3",
               "--output_dir", out])
    assert rc == 0
    preds = _json.load(open(os.path.join(out, "predictions.json")))
    prov = ImageFeatureProvider(
        os.path.join(out, "synthetic_caption", "features.tsv"))
    hit = 0
    for p in preds:
        classes = {o["class"] for o in prov.get_objects(p["image_id"])}
        if classes & set(p["caption"].split()):
            hit += 1
    assert hit >= len(preds) - 1, (hit, preds)  # allow 1 unconstrained edge


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


@pytest.mark.slow
def test_kv_cache_driver_e2e(tmp_path):
    """--kv_cache: the CLI wiring of the cached decoders (greedy decode at
    eval + the sampled/greedy cached pair inside SCST) must run end-to-end
    and learn as well as the full-recompute path."""
    from aladin_tpu.cli.captioning import main

    out = str(tmp_path / "kv")
    rc = main(["--synthetic", "--epochs", "6", "--scst_epochs", "1",
               "--kv_cache", "--train_batch_size", "8",
               "--max_seq_length", "24", "--max_seq_a_length", "12",
               "--max_img_seq_length", "8", "--img_feature_dim", "16",
               "--learning_rate", "3e-3", "--output_dir", out])
    assert rc == 0
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["Bleu_1"] > 0.5, metrics
    log = open(os.path.join(out, "log.txt")).read()
    assert "scst epoch 0" in log

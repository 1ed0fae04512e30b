"""Auxiliary subsystem tests: ROUGE-L, relevance builder, DCG/NDCG,
checkpoint round-trip, the joint tensorizer + entangled teacher path, and
the ALADIN .pth.tar converter."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aladin_tpu.eval.dcg import DCG, dcg_from_ranking, ndcg_from_ranking, ndcg_score
from aladin_tpu.eval.relevance import compute_relevances
from aladin_tpu.eval.rouge import Rouge


def test_rouge_l_basics():
    r = Rouge()
    assert r.calc_score(["a b c d"], ["a b c d"]) == 1.0
    assert r.calc_score(["x y z"], ["a b c"]) == 0.0
    # partial overlap: lcs("the cat sat", "the dog sat") = 2
    s = r.calc_score(["the cat sat"], ["the dog sat"])
    p = rrec = 2 / 3
    beta = 1.2
    expected = (1 + beta**2) * p * rrec / (rrec + beta**2 * p)
    assert abs(s - expected) < 1e-9
    # multi-reference takes the max prec/rec
    s2 = r.calc_score(["the cat sat"], ["zzz", "the cat sat"])
    assert s2 == 1.0


def test_rouge_l_lowercases_like_reference():
    # ref:alad/evaluate_utils/rouge.py:58-62 lowercases before LCS
    r = Rouge()
    assert r.calc_score(["A Dog Runs"], ["a dog runs"]) == 1.0


def test_meteor_matches_nltk_on_wordnet_free_inputs():
    """Our METEOR == nltk's on inputs whose hypothesis fully aligns in the
    exact+stem stages (where nltk runs without the WordNet corpus)."""
    from nltk.translate.meteor_score import meteor_score as nltk_meteor

    from aladin_tpu.eval.meteor import meteor_score, single_meteor_score

    cases = [
        (["a", "cat", "sat", "on", "the", "mat"], ["a", "cat", "sat", "on", "the", "mat"]),
        (["the", "cat", "sat"], ["sat", "cat", "the"]),  # chunk penalty
        (["cats", "running", "fast"], ["cat", "runs", "fast"]),  # stem stage
        (["a", "b", "c", "d", "e", "f"], ["a", "c", "b", "f", "e", "d"]),
    ]
    for ref, hyp in cases:
        ours = single_meteor_score(ref, hyp)
        theirs = nltk_meteor([ref], hyp)
        assert abs(ours - theirs) < 1e-12, (ref, hyp, ours, theirs)
    # multi-reference max + string inputs (old-nltk lower+split preprocess)
    assert meteor_score(["The cat sat", "zzz yyy"], "the cat sat") == \
        single_meteor_score("the cat sat", "the cat sat")


def test_meteor_hand_computed():
    from aladin_tpu.eval.meteor import single_meteor_score

    # identical 3-token sentences: P=R=1, fmean=1, 1 chunk, frag=1/3
    expected = 1.0 * (1 - 0.5 * (1 / 3) ** 3)
    assert abs(single_meteor_score("a b c", "a b c") - expected) < 1e-12
    assert single_meteor_score("a b c", "x y z") == 0.0


def test_relevance_builder_meteor(tmp_path):
    img_caps = [["a dog runs fast"], ["a cat sleeps now"], ["a red car drives"]]
    out = str(tmp_path / "coco-test-meteor.npy")
    mm = compute_relevances(img_caps, img_caps, out, method="meteor", num_workers=2)
    assert mm.shape == (3, 3)
    for i in range(3):
        assert mm[i, i] > 0.9  # self-match near 1 (frag penalty only)
        assert mm[i, i] >= mm[i].max() - 1e-9


def test_ndcg_math():
    # perfect ranking -> 1.0
    rel = np.array([3.0, 2.0, 1.0, 0.0])
    assert abs(ndcg_from_ranking(rel, [0, 1, 2]) - 1.0) < 1e-12
    # worst-first is below 1
    assert ndcg_from_ranking(rel, [3, 2, 1]) < 1.0
    # equivalence of the two APIs
    scores = np.array([0.1, 0.9, 0.5, 0.3])
    ranking = np.argsort(scores)[::-1][:3]
    assert abs(ndcg_score(rel, scores, k=3) - ndcg_from_ranking(rel, ranking)) < 1e-12
    assert dcg_from_ranking(rel, [0]) == 7.0  # 2^3 - 1


def test_relevance_builder_and_dcg(tmp_path):
    img_caps = [
        ["a dog runs", "dog in park"],
        ["a cat sleeps", "cat on sofa"],
        ["a red car", "car on road"],
    ]
    # queries = same caption sets -> diagonal should be the most relevant
    out = str(tmp_path / "coco" / "relevances" / "coco-test-rougeL.npy")
    mm = compute_relevances(img_caps, img_caps, out, num_workers=1)
    assert mm.shape == (3, 3)
    assert all(mm[i, i] == 1.0 for i in range(3))
    assert mm[0, 1] < 1.0

    scorer = DCG({"dataset": {"name": "coco", "data": str(tmp_path)}}, 3, "test",
                 rank=3, relevance_methods=["rougeL"])
    res = scorer.compute_ndcg(3, 0, np.array([0, 1, 2]), retrieval="image")
    assert 0.99 < res["rougeL"] <= 1.0


def test_checkpoint_roundtrip(tmp_path, rng):
    from aladin_tpu.config import ExperimentConfig
    from aladin_tpu.io.checkpoint import (
        load_checkpoint,
        load_teacher_params,
        resume_state,
        save_checkpoint,
    )
    from aladin_tpu.train.state import create_train_state

    cfg = ExperimentConfig.from_dict(
        {"training": {"loss-type": "matching", "loss-weights": [1]}}
    )
    params = {"w": jnp.array(rng.randn(4, 4).astype(np.float32)),
              "b": jnp.array(rng.randn(4).astype(np.float32))}
    state = create_train_state(cfg, params, 10)
    state = state.replace(step=jnp.int32(7))
    save_checkpoint(str(tmp_path), state, epoch=3, config_dict=cfg.to_dict(),
                    best_rsum=123.0, is_best_rsum=True)
    payload, cfg2 = load_checkpoint(str(tmp_path / "checkpoint"))
    assert payload["step"] == 7 and payload["epoch"] == 3
    assert cfg2["training"]["loss-type"] == "matching"
    assert os.path.isdir(tmp_path / "model_best_rsum")

    state2 = create_train_state(cfg, jax.tree.map(jnp.zeros_like, params), 10)
    state2, epoch, best = resume_state(state2, str(tmp_path / "checkpoint"))
    assert epoch == 3 and best == 123.0
    np.testing.assert_array_equal(
        np.asarray(state2.params["model"]["w"]), np.asarray(params["w"])
    )
    # teacher load: partial (extra keys in target survive)
    state3 = create_train_state(
        cfg, {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,)), "extra": jnp.ones((2,))}, 10
    )
    state3 = load_teacher_params(state3, str(tmp_path / "checkpoint"))
    np.testing.assert_array_equal(np.asarray(state3.params["model"]["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(np.asarray(state3.params["model"]["extra"]), np.ones((2,)))


def test_resume_rejects_mismatched_opt_state(tmp_path, rng):
    """Resuming into a train state whose optimizer layout differs from the
    checkpoint must raise, not silently transplant leaves (e.g. freeze_teran
    toggled between save and resume)."""
    from aladin_tpu.config import ExperimentConfig
    from aladin_tpu.io.checkpoint import resume_state, save_checkpoint
    from aladin_tpu.train.state import create_train_state

    cfg = ExperimentConfig.from_dict(
        {"training": {"loss-type": "matching", "loss-weights": [1]}}
    )
    params = {"w": jnp.array(rng.randn(4, 4).astype(np.float32))}
    state = create_train_state(cfg, params, 10)
    save_checkpoint(str(tmp_path), state, epoch=1, config_dict=cfg.to_dict(), best_rsum=0.0)

    # different param tree -> different adam moment tree
    other = create_train_state(
        cfg, {"w": jnp.zeros((4, 4)), "extra": jnp.zeros((3,))}, 10
    )
    with pytest.raises(ValueError):
        resume_state(other, str(tmp_path / "checkpoint"))

    # same tree but different leaf shape -> also rejected
    other2 = create_train_state(cfg, {"w": jnp.zeros((5, 4))}, 10)
    with pytest.raises(ValueError):
        resume_state(other2, str(tmp_path / "checkpoint"))


def test_joint_tensorizer(tmp_path, rng):
    from aladin_tpu.data.dataset import DisentangledTensorizer
    from aladin_tpu.data.tokenizer import BertWordPieceTokenizer

    vocab = {t: i for i, t in enumerate(
        "[PAD] [UNK] [CLS] [SEP] [MASK] a dog cat photo of the".split()
    )}
    tok = BertWordPieceTokenizer(vocab)
    tz = DisentangledTensorizer(tok, max_seq_len=12, max_img_seq_len=5, img_feature_dim=8)
    feats = rng.randn(3, 8).astype(np.float32)
    ids, mask, seg, out_feats, seq_a_len, img_len = tz.tensorize_joint(
        "a photo of a dog", "dog cat", feats
    )
    assert ids[0] == vocab["[CLS]"]
    assert ids[seq_a_len - 1] == vocab["[SEP]"]
    # second segment: od labels get segment id 1, ending with SEP
    seq_len = int(mask[:12].sum())
    assert seg[seq_a_len] == 1 and ids[seq_len - 1] == vocab["[SEP]"]
    assert img_len == 3 and out_feats.shape == (5, 8)
    assert mask[12:].sum() == 3


def test_oscar_teacher_scores(rng):
    from aladin_tpu.models.bert_img import ImageBertClassifier
    from aladin_tpu.tasks.oscar_teacher import teacher_scores
    from tests.test_models import small_cfg

    cfg = small_cfg(num_labels=2)
    model = ImageBertClassifier(cfg)
    b, l, r = 3, 10, 4
    n = b * b
    ids = jnp.array(rng.randint(3, cfg.vocab_size, (n, l)).astype(np.int32))
    mask = jnp.ones((n, l + r), jnp.int32)
    seg = jnp.zeros((n, l), jnp.int32)
    feats = jnp.array(rng.randn(n, r, cfg.img_feature_dim).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ids[:1], mask[:1], seg[:1], feats[:1], True, True)[
        "params"
    ]
    probs, atts = teacher_scores(model, params, ids, mask, seg, feats, b, chunk=3)
    assert probs.shape == (b, b)
    assert atts.shape == (b, b, l - 1, r)
    assert np.isfinite(np.asarray(probs)).all()
    assert ((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1)).all()


def test_legacy_retrieval_ranks():
    from aladin_tpu.tasks.retrieval_oscar import ranks_from_pair_probs

    n, k = 3, 2
    probs = np.full((n, n * k), 0.1, np.float32)
    for i in range(n):
        probs[i, i * k : (i + 1) * k] = 0.9
    i2t, t2i = ranks_from_pair_probs(probs, k)
    assert (i2t == 0).all() and (t2i == 0).all()


def test_aladin_pth_tar_converter(tmp_path, rng):
    """Round-trip: a torch-constructed reference-shaped checkpoint converts
    and drives our matching head to the same outputs as the torch TE."""
    import torch

    from aladin_tpu.io.convert import load_aladin_checkpoint
    from aladin_tpu.models.layers import TorchTransformerEncoder

    torch.manual_seed(0)
    d = 16
    te = torch.nn.TransformerEncoder(
        torch.nn.TransformerEncoderLayer(d_model=d, nhead=4, dim_feedforward=d, dropout=0.0),
        num_layers=1,
    )
    te.eval()
    sd = {f"img_txt_enc.final_projection_net.{k}": v for k, v in te.state_dict().items()}
    ckpt = {"epoch": 5, "model": sd, "optimizer": {}, "scheduler": None,
            "opt": None, "config": {"model": {"embed-size": d}}, "Eiters": 42}
    path = str(tmp_path / "model_best_rsum.pth.tar")
    torch.save(ckpt, path)

    tree, cfg, meta = load_aladin_checkpoint(path)
    assert meta == {"epoch": 5, "Eiters": 42}
    assert cfg["model"]["embed-size"] == d

    ours = TorchTransformerEncoder(1, d, nhead=4, dim_feedforward=d, dropout=0.0)
    x = rng.randn(2, 5, d).astype(np.float32)
    got = ours.apply({"params": tree["final_projection_net"]}, jnp.array(x), None, True)
    with torch.no_grad():
        ref = te(torch.tensor(x).permute(1, 0, 2)).permute(1, 0, 2).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)

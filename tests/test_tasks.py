"""Task-layer tests: pretraining (MLM + seq relation), classification
(vqa/gqa/nlvr losses), CIDEr-D, SCST reward, metric logger."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from aladin_tpu.eval.cider import CiderD
from aladin_tpu.tasks.classification import (
    ImageBertForMultipleChoice,
    classification_loss,
    make_classifier_train_step,
    vqa_score,
)
from aladin_tpu.tasks.pretraining import (
    BertImgForPreTraining,
    make_pretrain_step,
    pollute_tags,
    pretraining_loss,
    random_word_mask,
)
from aladin_tpu.tasks.scst import ScstRewardCriterion
from aladin_tpu.utils.metric_logger import MetricLogger, SmoothedValue
from tests.test_models import small_cfg


def test_random_word_mask(rng):
    ids = np.arange(5, 105).astype(np.int64)
    rs = np.random.RandomState(0)
    masked, labels = random_word_mask(ids, vocab_size=200, rng=rs, mask_id=3)
    changed = labels >= 0
    assert 0.05 < changed.mean() < 0.3  # ~15%
    # labels hold the original where masked; untouched positions keep ids
    np.testing.assert_array_equal(labels[changed], ids[changed])
    np.testing.assert_array_equal(masked[~changed], ids[~changed])
    # pad never masked
    ids2 = np.zeros(50, np.int64)
    m2, l2 = random_word_mask(ids2, 200, rs, 3)
    assert (l2 == -1).all()


def test_pollute_tags():
    rs = np.random.RandomState(1)
    tags = np.arange(12).reshape(4, 3)
    out, labels = pollute_tags(tags, rs, prob=1.0)
    assert (labels == 1).all()
    for i in range(4):
        assert not np.array_equal(out[i], tags[i])
    out2, labels2 = pollute_tags(tags, rs, prob=0.0)
    np.testing.assert_array_equal(out2, tags)
    assert (labels2 == 0).all()


def test_pretraining_loss_vs_torch(rng):
    b, l, v = 3, 7, 13
    mlm_logits = rng.randn(b, l, v).astype(np.float32)
    rel_logits = rng.randn(b, 2).astype(np.float32)
    labels = rng.randint(-1, v, (b, l)).astype(np.int64)
    rel = rng.randint(0, 2, b).astype(np.int64)
    total, _, _ = pretraining_loss(
        jnp.array(mlm_logits), jnp.array(rel_logits), jnp.array(labels), jnp.array(rel)
    )
    ce = torch.nn.CrossEntropyLoss(ignore_index=-1)
    ref = ce(torch.tensor(mlm_logits).view(-1, v), torch.tensor(labels).view(-1)) + ce(
        torch.tensor(rel_logits), torch.tensor(rel)
    )
    assert abs(float(total) - float(ref)) < 1e-4


def test_pretrain_step_runs(rng):
    cfg = small_cfg()
    model = BertImgForPreTraining(cfg)
    b, l, r = 2, 8, 3
    ids = jnp.array(rng.randint(3, cfg.vocab_size, (b, l)).astype(np.int32))
    mask = jnp.ones((b, l + r), jnp.int32)
    seg = jnp.zeros((b, l), jnp.int32)
    feats = jnp.array(rng.randn(b, r, cfg.img_feature_dim).astype(np.float32))
    labels = jnp.array(rng.randint(-1, cfg.vocab_size, (b, l)).astype(np.int64))
    rel = jnp.array(rng.randint(0, 2, b).astype(np.int64))
    params = model.init(jax.random.PRNGKey(0), ids, mask, seg, feats, True)["params"]
    tx = optax.adam(1e-4)
    step = make_pretrain_step(model, tx)
    params, opt_state, m = step(params, tx.init(params), ids, mask, seg, feats,
                                labels, rel, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_classification_losses_vs_torch(rng):
    b, n = 4, 9
    logits = rng.randn(b, n).astype(np.float32)
    hard = rng.randint(0, n, b).astype(np.int64)
    soft = rng.rand(b, n).astype(np.float32)
    soft = soft / soft.sum(1, keepdims=True)

    ce = float(classification_loss(jnp.array(logits), jnp.array(hard), "ce"))
    assert abs(ce - float(torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(hard)))) < 1e-5

    bce = float(classification_loss(jnp.array(logits), jnp.array(soft), "bce"))
    ref_bce = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(soft)) * n
    assert abs(bce - float(ref_bce)) < 1e-4

    kl = float(classification_loss(jnp.array(logits), jnp.array(soft), "kl"))
    ref_kl = torch.nn.functional.kl_div(
        torch.log_softmax(torch.tensor(logits), -1), torch.tensor(soft),
        reduction="batchmean")
    assert abs(kl - float(ref_kl)) < 1e-4

    s = vqa_score(jnp.array(logits), jnp.array(soft))
    assert 0.0 <= float(s) <= 1.0


def test_multiple_choice_head(rng):
    cfg = small_cfg()
    model = ImageBertForMultipleChoice(cfg, num_choices=2, num_labels=2)
    b, c, l, r = 2, 2, 6, 3
    ids = jnp.array(rng.randint(3, cfg.vocab_size, (b, c, l)).astype(np.int32))
    mask = jnp.ones((b, c, l + r), jnp.int32)
    seg = jnp.zeros((b, c, l), jnp.int32)
    feats = jnp.array(rng.randn(b, c, r, cfg.img_feature_dim).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ids, mask, seg, feats, True)
    logits = model.apply(params, ids, mask, seg, feats, True)
    assert logits.shape == (b, 2)

    # linear-head variant (ref:modeling_bert.py:375-377)
    lin = ImageBertForMultipleChoice(cfg, classifier="linear")
    p2 = lin.init(jax.random.PRNGKey(0), ids, mask, seg, feats, True)
    assert lin.apply(p2, ids, mask, seg, feats, True).shape == (b, 2)

    # per-choice form (ref:modeling_bert.py:470-572): (B, C, num_labels),
    # and each choice's logits depend only on its own stream
    from aladin_tpu.tasks.classification import OscarForMultipleChoice

    oc = OscarForMultipleChoice(cfg)
    p3 = oc.init(jax.random.PRNGKey(0), ids, mask, seg, feats, True)
    out = oc.apply(p3, ids, mask, seg, feats, True)
    assert out.shape == (b, c, 2)
    ids2 = ids.at[:, 1].set(ids[:, 1] ^ 1)  # perturb choice 1 only
    out2 = oc.apply(p3, ids2, mask, seg, feats, True)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out2[:, 0]), atol=1e-6)


def test_cider_d():
    gts = {0: ["a dog runs in the park", "the dog is running"],
           1: ["a red car on the road", "a car drives by"]}
    res_exact = {0: ["a dog runs in the park"], 1: ["a red car on the road"]}
    res_bad = {0: ["purple elephants fly high"], 1: ["nothing to see here now"]}
    c = CiderD()
    exact, _ = c.compute_score(gts, res_exact)
    bad, _ = c.compute_score(gts, res_bad)
    assert exact > bad >= 0.0
    assert exact > 1.0  # exact matches score high (scale x10)


def test_scst_reward_and_loss():
    crit = ScstRewardCriterion()
    gt = [["a dog runs", "dog running fast"], ["a red car", "car on road"]]
    adv = crit.rewards(["a dog runs", "a red car"], ["dog", "car"], gt)
    assert adv.shape == (2,)
    assert (adv > 0).all()  # samples match GT better than 1-word baselines

    lp = jnp.array([[-1.0, -2.0], [-0.5, -3.0]])
    mask = jnp.array([[1.0, 1.0], [1.0, 0.0]])
    loss = ScstRewardCriterion.loss(jnp.array(adv), lp, mask)
    assert np.isfinite(float(loss))


def test_metric_logger():
    sv = SmoothedValue(window_size=3)
    for v in (1, 2, 3, 4):
        sv.update(v)
    assert sv.median == 3 and abs(sv.avg - 3.0) < 1e-9 and sv.global_avg == 2.5
    ml = MetricLogger()
    ml.update(loss=1.0, acc=0.5)
    ml.update(loss=2.0, acc=0.6)
    assert "loss" in str(ml)
    assert ml.loss.global_avg == 1.5


def test_attdistillation_composition(rng):
    """The entangled teacher's attentions compose directly with
    attention_distillation_loss (the reference's unreachable attdistillation
    path, SURVEY S2.6(7), made reachable end-to-end)."""
    from aladin_tpu.ops.losses import attention_distillation_loss
    from aladin_tpu.tasks.oscar_teacher import teacher_scores

    cfg = small_cfg(num_labels=2)
    model = __import__("aladin_tpu.models.bert_img", fromlist=["ImageBertClassifier"]).ImageBertClassifier(cfg)
    b, l, r = 3, 10, 6
    n = b * b
    ids = jnp.array(rng.randint(3, cfg.vocab_size, (n, l)).astype(np.int32))
    mask = jnp.ones((n, l + r), jnp.int32)
    seg = jnp.zeros((n, l), jnp.int32)
    feats = jnp.array(rng.randn(n, r, cfg.img_feature_dim).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ids[:1], mask[:1], seg[:1], feats[:1],
                        True, True)["params"]
    _, atts = teacher_scores(model, params, ids, mask, seg, feats, b, chunk=3)

    im_set = jnp.array(rng.randn(b, r, 16).astype(np.float32))
    s_seq = jnp.array(rng.randn(b, l, 16).astype(np.float32))
    loss = attention_distillation_loss(
        im_set, s_seq, jnp.array([6, 4, 5]), jnp.array([10, 7, 8]), atts
    )
    assert np.isfinite(float(loss))

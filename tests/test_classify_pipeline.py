"""VQA / GQA / NLVR2 task pipelines: data -> train step -> eval protocol,
through the unified driver (the run_vqa/run_gqa/run_nlvr.py capability,
VERDICT r1 missing #3 / next-step #7b)."""

import json
import os

import numpy as np
import pytest

from aladin_tpu.tasks.task_inputs import (
    ImageFeatureProvider,
    load_answer_vocab,
    load_gqa_examples,
    load_nlvr_examples,
    load_vqa_examples,
    make_synthetic_task_data,
)


@pytest.fixture(scope="module")
def task_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tasks"))
    make_synthetic_task_data(root, feat_dim=16)
    return root


def test_fixture_and_loaders(task_root):
    a2l = load_answer_vocab(os.path.join(task_root, "answers.txt"))
    assert len(a2l) == 10 and a2l["yes"] == 0

    vqa = load_vqa_examples(os.path.join(task_root, "vqa_train.jsonl"), a2l)
    assert len(vqa) == 32
    ex = vqa[0]
    assert ex.answer_scores and max(ex.answer_scores.values()) == 1.0

    gqa = load_gqa_examples(os.path.join(task_root, "gqa_val.jsonl"), a2l)
    assert all(e.answer is not None and 0 <= e.answer < 10 for e in gqa)

    nlvr = load_nlvr_examples(os.path.join(task_root, "nlvr_train.jsonl"))
    labels = {e.label for e in nlvr}
    assert labels == {0, 1}  # balanced-ish true/false statements

    prov = ImageFeatureProvider(os.path.join(task_root, "features.tsv"))
    feats = prov.get_image(vqa[0].img_key)
    assert feats.shape[1] == 16
    assert prov.get_od_labels(vqa[0].img_key)


def test_vcr_processors(task_root):
    """The reference registry's three VCR processors (VERDICT r2 missing #4;
    ref:oscar/utils/task_utils.py:273-414,567-575): loading semantics per
    task, qar's train-only qa->r append, test-split label suppression, and
    conversion to the 4-choice ImageBertForMultipleChoice layout."""
    from aladin_tpu.data.dataset import DisentangledTensorizer
    from aladin_tpu.data.tokenizer import BertWordPieceTokenizer
    from aladin_tpu.tasks.task_inputs import convert_vcr_batch, load_vcr_examples

    path = os.path.join(task_root, "vcr_train.json")
    q_a = load_vcr_examples(path, "vcr_q_a", "train")
    qa_r = load_vcr_examples(path, "vcr_qa_r", "train")
    qar = load_vcr_examples(path, "vcr_qar", "train")
    assert len(q_a) == 32 and len(qa_r) == 32
    # qar = q->a plus the train-only qa->r examples (ref:task_utils.py:396-413)
    assert len(qar) == 2 * 32
    assert len(load_vcr_examples(path, "vcr_qar", "val")) == 32

    ex = q_a[0]
    assert len(ex.choices) == 4 and 0 <= ex.label < 4
    assert ex.q_id == 0 and ex.objects  # annot_id suffix; objects carried
    # qa->r prepends the GOLD answer text to the question
    assert qa_r[0].text_a.startswith(ex.text_a)
    assert ex.choices[ex.label] in qa_r[0].text_a
    # test split: labels suppressed (ref:task_utils.py:310)
    test_ex = load_vcr_examples(os.path.join(task_root, "vcr_test.json"),
                                "vcr_q_a", "test")
    assert all(e.label is None for e in test_ex)

    vocab = {t: i for i, t in enumerate(
        "[PAD] [UNK] [CLS] [SEP] [MASK] a what is in the picture because "
        "there no visible dog cat car tree person boat bird house".split())}
    tz = DisentangledTensorizer(BertWordPieceTokenizer(vocab),
                                max_seq_len=20, max_img_seq_len=6,
                                img_feature_dim=16)
    prov = ImageFeatureProvider(os.path.join(task_root, "features.tsv"))
    ids, mask, seg, feats, labels = convert_vcr_batch(q_a[:3], tz, prov.get_image)
    assert ids.shape == (3, 4, 20) and feats.shape == (3, 4, 6, 16)
    assert mask.shape == (3, 4, 26) and labels.shape == (3,)
    # choice text differs across the 4 rows of each example
    assert any((ids[0, 0] != ids[0, j]).any() for j in range(1, 4))
    # the per-choice stream is [CLS] q [SEP] choice [SEP]: segment 1 marks
    # the choice tokens
    assert (seg[0] == 1).any()


def test_vqa_score_semantics():
    import jax.numpy as jnp

    from aladin_tpu.tasks.classification import vqa_score

    logits = jnp.array([[0.0, 5.0, 0.0], [9.0, 0.0, 0.0]])
    soft = jnp.array([[0.0, 0.6, 1.0], [1.0, 0.0, 0.0]])
    # argmax answers score 0.6 and 1.0 under the soft targets
    assert abs(float(vqa_score(logits, soft)) - 0.8) < 1e-6


@pytest.mark.slow
def test_retrieval_oscar_driver_e2e(tmp_path):
    """Legacy entangled-retrieval pipeline: pair training with negative
    sampling -> cross_image_eval N x N ranks (run_retrieval.py capability)."""
    from aladin_tpu.cli.retrieval_oscar import main

    out = str(tmp_path / "retr")
    rc = main(["--synthetic", "--epochs", "2", "--train_batch_size", "8",
               "--max_seq_length", "20", "--max_img_seq_length", "12",
               "--img_feature_dim", "16", "--eval_chunk", "40",
               "--output_dir", out])
    assert rc == 0
    res = json.load(open(os.path.join(out, "eval_results.json")))
    assert {"i2t_r1", "t2i_r10", "rsum"} <= set(res)
    assert 0 <= res["rsum"] <= 600


@pytest.mark.slow
@pytest.mark.parametrize("task,metric_floor", [
    ("vqa", 0.25),   # answer-prior baseline ~0.13; must beat it
    ("gqa", 0.3),    # chance 0.1
    ("nlvr", 0.55),  # chance 0.5
])
def test_driver_e2e_learns(tmp_path, task, metric_floor):
    from aladin_tpu.cli.classify import main

    out = str(tmp_path / task)
    rc = main(["--task", task, "--synthetic", "--epochs", "12",
               "--train_batch_size", "8", "--max_seq_length", "32",
               "--max_img_seq_length", "10", "--img_feature_dim", "16",
               "--learning_rate", "5e-3", "--output_dir", out, "--do_test"])
    assert rc == 0
    import re

    log = open(os.path.join(out, "log.txt")).read()
    vals = [float(m) for m in re.findall(r"val (?:score|acc) (\d+\.\d+)", log)]
    assert vals and vals[-1] > metric_floor, vals
    res_file = os.path.join(out, f"{task}_test_results.json")
    results = json.load(open(res_file))
    assert len(results) == 32 and {"question_id", "answer"} <= set(results[0])

"""Caption metric orchestration + task input processor tests."""

import numpy as np
import pytest

from aladin_tpu.eval.caption_metrics import bleu_score, evaluate_captions
from aladin_tpu.tasks.task_inputs import (
    GqaExample,
    NlvrExample,
    VqaExample,
    convert_gqa_batch,
    convert_nlvr_batch,
    convert_vqa_batch,
    vqa_soft_target,
)


def test_bleu_exact_match():
    b = bleu_score(["a dog runs in the park"], [["a dog runs in the park"]])
    assert all(abs(x - 1.0) < 1e-9 for x in b)


def test_bleu_partial_and_brevity():
    b = bleu_score(["a dog"], [["a dog runs in the park"]])
    assert b[0] < 1.0  # brevity penalty bites
    b2 = bleu_score(["the the the the"], [["the cat"]])
    assert b2[0] < 0.6  # clipping: 'the' counted at most ref count


def test_evaluate_captions_composite():
    gts = {0: ["a dog runs", "the dog is running"], 1: ["a red car", "car on road"]}
    preds = {0: ["a dog runs"], 1: ["a red car"]}
    m = evaluate_captions(preds, gts)
    assert set(m) >= {"Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"}
    assert m["ROUGE_L"] == 1.0
    assert m["CIDEr"] > 1.0
    worse = evaluate_captions({0: ["purple elephant"], 1: ["nothing here"]}, gts)
    assert worse["CIDEr"] < m["CIDEr"] and worse["Bleu_4"] < m["Bleu_4"]


class _FakeTensorizer:
    def tensorize_joint(self, text, od, feats):
        ids = np.full(8, hash(text) % 100, np.int32)
        return ids, np.ones(12, np.int32), np.zeros(8, np.int32), np.zeros((4, 6), np.float32), 3, 4


def test_task_input_converters(rng):
    tz = _FakeTensorizer()
    get_image = lambda k: rng.randn(4, 6).astype(np.float32)  # noqa: E731
    get_od = lambda k: "dog cat"  # noqa: E731

    v = VqaExample("q1", "what is it", "img1", {2: 1.0, 5: 0.3})
    t = vqa_soft_target(v, 10)
    assert t[2] == 1.0 and t[5] == 0.3 and t.sum() == 1.3
    ids, mask, seg, feats, tgts = convert_vqa_batch([v, v], tz, get_image, get_od, 10)
    assert ids.shape == (2, 8) and tgts.shape == (2, 10)

    g = GqaExample("q2", "how many", "img1", answer=7)
    _, _, _, _, labels = convert_gqa_batch([g], tz, get_image, get_od)
    assert labels[0] == 7

    n = NlvrExample("u1", "both images show dogs", "l", "r", label=1)
    ids, mask, seg, feats, labels = convert_nlvr_batch([n], tz, get_image, get_od)
    assert ids.shape == (1, 2, 8) and feats.shape == (1, 2, 4, 6)
    assert labels[0] == 1

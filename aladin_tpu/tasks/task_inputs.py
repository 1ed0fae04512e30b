"""Task input processors: VQA / GQA / NLVR2 example -> tensor conversion.

Equivalent capability to ref:oscar/utils/task_utils.py: typed example
records per task, label-space handling (VQA 3129-way soft answer scores, GQA
single answers, NLVR2 boolean pair choice), and conversion to the static
joint streams the classifiers consume (via data/dataset.py's
DisentangledTensorizer.tensorize_joint).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class VqaExample:
    qid: str
    question: str
    img_key: str
    # soft answer distribution over the answer vocabulary (VQA convention:
    # score in {0, 0.3, 0.6, 1} per annotator agreement)
    answer_scores: Dict[int, float] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class GqaExample:
    qid: str
    question: str
    img_key: str
    answer: Optional[int] = None


@dataclasses.dataclass
class NlvrExample:
    uid: str
    statement: str
    img_key_left: str
    img_key_right: str
    label: Optional[int] = None  # 1 = statement true


def load_answer_vocab(path: str) -> Dict[str, int]:
    """answer -> index mapping (the VQA trainval label map)."""
    with open(path) as f:
        if path.endswith(".json"):
            d = json.load(f)
            if isinstance(d, list):
                return {a: i for i, a in enumerate(d)}
            return {k: int(v) for k, v in d.items()}
        return {line.strip(): i for i, line in enumerate(f) if line.strip()}


def vqa_soft_target(example: VqaExample, num_answers: int) -> np.ndarray:
    t = np.zeros(num_answers, np.float32)
    for idx, score in example.answer_scores.items():
        if 0 <= idx < num_answers:
            t[idx] = score
    return t


def convert_vqa_batch(examples: Sequence[VqaExample], tensorizer, get_image,
                      get_od_labels, num_answers: int):
    """-> (ids, mask, seg, feats, soft_targets) static numpy batch."""
    ids, mask, seg, feats, tgts = [], [], [], [], []
    for ex in examples:
        t = tensorizer.tensorize_joint(ex.question, get_od_labels(ex.img_key),
                                       get_image(ex.img_key))
        ids.append(t[0]); mask.append(t[1]); seg.append(t[2]); feats.append(t[3])
        tgts.append(vqa_soft_target(ex, num_answers))
    return (np.stack(ids), np.stack(mask), np.stack(seg),
            np.stack(feats).astype(np.float32), np.stack(tgts))


def convert_gqa_batch(examples: Sequence[GqaExample], tensorizer, get_image, get_od_labels):
    ids, mask, seg, feats, labels = [], [], [], [], []
    for ex in examples:
        t = tensorizer.tensorize_joint(ex.question, get_od_labels(ex.img_key),
                                       get_image(ex.img_key))
        ids.append(t[0]); mask.append(t[1]); seg.append(t[2]); feats.append(t[3])
        labels.append(ex.answer if ex.answer is not None else -1)
    return (np.stack(ids), np.stack(mask), np.stack(seg),
            np.stack(feats).astype(np.float32), np.asarray(labels, np.int64))


def convert_nlvr_batch(examples: Sequence[NlvrExample], tensorizer, get_image, get_od_labels):
    """-> (ids, mask, seg, feats) with a leading num_choices=2 axis + labels."""
    out = {k: [] for k in ("ids", "mask", "seg", "feats")}
    labels = []
    for ex in examples:
        per_choice = []
        for key in (ex.img_key_left, ex.img_key_right):
            per_choice.append(
                tensorizer.tensorize_joint(ex.statement, get_od_labels(key), get_image(key))
            )
        out["ids"].append(np.stack([c[0] for c in per_choice]))
        out["mask"].append(np.stack([c[1] for c in per_choice]))
        out["seg"].append(np.stack([c[2] for c in per_choice]))
        out["feats"].append(np.stack([c[3] for c in per_choice]))
        labels.append(ex.label if ex.label is not None else -1)
    return (np.stack(out["ids"]), np.stack(out["mask"]), np.stack(out["seg"]),
            np.stack(out["feats"]).astype(np.float32), np.asarray(labels, np.int64))

"""Offline builder of NDCG relevance matrices.

Equivalent capability to ref:alad/evaluate_utils/compute_relevance.py: for
every (query caption-set, candidate caption-set) pair, a caption-overlap
relevance score - ROUGE-L (max over the 5x5 cross pairs... strictly the
reference scores the query sentence list against each image's reference
captions) - written into an np.memmap of shape (n_queries, n_images) as
``{dataset}-{split}-{method}.npy``, consumable by eval/dcg.py.

ROUGE-L runs natively here (eval/rouge.py). SPICE and PTB tokenization in
the reference shell out to Java jars (ref:evaluate_utils/spice.py:78-85,
ptbtokenizer.py:19-31); those wrappers are provided in eval/spice.py and
gated on the jars being present - they are host-side preprocessing, never on
the device path (SURVEY.md S2.4).

Parallelism: a process pool over queries (the reference uses
multiprocessing.Pool with worker-global init, ref:compute_relevance.py:56-59,
112-115).
"""

from __future__ import annotations

import os
from multiprocessing import Pool
from typing import Dict, List, Sequence

import numpy as np

from aladin_tpu.eval.rouge import Rouge

_WORKER: Dict[str, object] = {}


def _init_worker(captions_per_image: List[List[str]]):
    _WORKER["caps"] = captions_per_image
    _WORKER["rouge"] = Rouge()


def _score_query(args):
    qi, query_caps = args
    caps: List[List[str]] = _WORKER["caps"]  # type: ignore[assignment]
    rouge: Rouge = _WORKER["rouge"]  # type: ignore[assignment]
    row = np.zeros(len(caps), np.float32)
    for ii, refs in enumerate(caps):
        # max over the query's sentences of ROUGE-L(query sentence, refs)
        row[ii] = max(rouge.calc_score([q], refs) for q in query_caps)
    return qi, row


def compute_relevances(
    query_caption_sets: Sequence[List[str]],
    image_caption_sets: Sequence[List[str]],
    out_path: str,
    method: str = "rougeL",
    num_workers: int = 4,
) -> np.ndarray:
    """Build (n_queries, n_images) relevance memmap at out_path."""
    if method != "rougeL":
        raise NotImplementedError(
            f"{method}: only rougeL is computed natively; SPICE requires the "
            "Java jars (see eval/spice.py)"
        )
    n_q, n_i = len(query_caption_sets), len(image_caption_sets)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    # RAW float32 memmap (no .npy header): the reference reader memmaps the
    # file raw despite the extension (ref:dcg.py:15-17) - match that layout.
    mm = np.memmap(out_path, mode="w+", dtype=np.float32, shape=(n_q, n_i))
    jobs = list(enumerate(query_caption_sets))
    if num_workers > 1:
        with Pool(num_workers, initializer=_init_worker, initargs=(list(image_caption_sets),)) as p:
            for qi, row in p.imap_unordered(_score_query, jobs, chunksize=8):
                mm[qi] = row
    else:
        _init_worker(list(image_caption_sets))
        for job in jobs:
            qi, row = _score_query(job)
            mm[qi] = row
    mm.flush()
    return mm

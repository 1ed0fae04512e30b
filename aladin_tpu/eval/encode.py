"""Corpus encoding: run the model over a split, collect embedding buffers.

Reference contract (ref:alad/evaluation.py:80-155 encode_data): buffers are
(N, buffer_len, D) with per-token set/sequence embeddings written from
position 0 and THE GLOBAL MATCHING EMBEDDING OVERWRITING position 0
("I-CLS"/"T-CLS" packing). This is safe because alignment scoring strips
position 0 on both sides (ref:alad/loss.py:87-88). The reference hard-codes
buffer_len=71 (ref:evaluation.py:98-99, defect S2.6(6)); here it derives
from the actual shapes, with 71 available for bit-parity.

The forward runs as one jitted eval step; batches stream through the
prefetching loader; buffers live on host (the 5k-test buffers are ~3 GB).
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np

from aladin_tpu.utils.logging import AverageMeter, LogCollector, setup_logger


def encode_data(
    eval_step,
    model_params,
    loader,
    buffer_len: Optional[int] = None,
    log_step: int = 10,
    logger=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (img_embs (N, S, D), cap_embs (N, S, D), img_lens, cap_lens)."""
    logger = logger or setup_logger()
    batch_time = AverageMeter()
    collector = LogCollector()

    img_embs = cap_embs = None
    img_lens, cap_lens = [], []
    ptr = 0
    n = len(loader.dataset)
    end = time.time()
    for i, batch in enumerate(loader.epoch(0)):
        out = eval_step(model_params, batch)
        img_set = np.asarray(out.img_set, np.float32)
        cap_seq = np.asarray(out.cap_seq, np.float32)
        img_glob = np.asarray(out.img_global, np.float32)
        cap_glob = np.asarray(out.cap_global, np.float32)
        # the loader pads the final partial batch by wrapping; clip the wraps
        b = min(img_set.shape[0], n - ptr)

        if img_embs is None:
            s = buffer_len or (max(img_set.shape[1], cap_seq.shape[1]) + 1)
            img_embs = np.zeros((n, s, img_set.shape[2]), np.float32)
            cap_embs = np.zeros((n, s, cap_seq.shape[2]), np.float32)
        wide = max(img_set.shape[1], cap_seq.shape[1])
        if wide > img_embs.shape[1]:
            # a variable-width loader (length-bucketed encode) can yield
            # wider batches later; grow the buffers instead of crashing
            grow = wide - img_embs.shape[1]
            img_embs = np.pad(img_embs, ((0, 0), (0, grow), (0, 0)))
            cap_embs = np.pad(cap_embs, ((0, 0), (0, grow), (0, 0)))

        img_embs[ptr : ptr + b, : img_set.shape[1]] = img_set[:b]
        cap_embs[ptr : ptr + b, : cap_seq.shape[1]] = cap_seq[:b]
        # global embeddings take slot 0 (the reference's I-CLS/T-CLS packing)
        img_embs[ptr : ptr + b, 0] = img_glob[:b]
        cap_embs[ptr : ptr + b, 0] = cap_glob[:b]
        img_lens.extend(np.asarray(out.img_len).tolist()[:b])
        cap_lens.extend(np.asarray(out.cap_len).tolist()[:b])
        ptr += b

        batch_time.update(time.time() - end)
        end = time.time()
        if i % log_step == 0:
            logger.info(f"Encode [{i}/{len(loader)}] {collector} time {batch_time}")

    return (
        img_embs[:ptr],
        cap_embs[:ptr],
        np.asarray(img_lens[:ptr], np.int32),
        np.asarray(cap_lens[:ptr], np.int32),
    )

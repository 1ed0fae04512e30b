"""Host -> device input pipeline: batching, shuffling, prefetch.

Replaces the reference's torch DataLoader + 4 worker processes
(ref:alad/train.py:216-217) with a TPU-appropriate design: a thread pool
tensorizes numpy batches ahead of time while the device computes, and
batches are transferred (optionally sharded over the dp mesh axis) one step
ahead - classic double buffering. Static batch size (drop-last) keeps a
single compiled program.
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np

from aladin_tpu.models.aladin import Batch


def _make_put(sharding):
    """Transfer fn for one batch. Single-process: a plain (possibly sharded)
    device_put. Multi-process (jax.process_count() > 1): every process holds
    the SAME global numpy batch (loaders are seed-deterministic), and each
    contributes the shards its local devices own via make_array_from_callback
    - the jax.Array spans the whole (possibly multi-host) mesh, which is what
    a pjit train step over a process-spanning mesh requires
    (ref DDP equivalent: oscar/run_oscarplus_pretrain.py:316-318; the torch
    DistributedSampler's per-rank slicing becomes the sharding's index map).
    """
    if sharding is None:
        return jax.device_put
    if jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

        return put
    return lambda x: jax.device_put(x, sharding)


def batch_from_numpy(d, sharding=None) -> Batch:
    put = _make_put(sharding)
    return Batch(
        txt_ids=put(d["txt_ids"]),
        txt_mask=put(d["txt_mask"]),
        txt_type=put(d["txt_type"]),
        cap_len=put(d["cap_len"]),
        img_ids=put(d["img_ids"]),
        img_mask=put(d["img_mask"]),
        img_type=put(d["img_type"]),
        img_feats=put(d["img_feats"]),
        img_len=put(d["img_len"]),
    )


def _round_up(x: int, m: int) -> int:
    return -(-int(x) // m) * m


def trim_batch(d, multiple: int):
    """Trim a collated numpy batch to its max real lengths, rounded up.

    TPU length bucketing: padding the text stream to the flag maximum (50)
    wastes most of the encode FLOPs on real COCO captions (~14 wordpieces).
    Slicing each batch to round_up(batch max, multiple) keeps shapes static
    per bucket — jit compiles once per distinct (text, region) width pair,
    a handful with coarse multiples — while every kept position computes
    what the full-width batch would (embeddings and masks are
    position-stable; outputs agree up to batch-shape-dependent float
    rounding, verified to 2e-5 and to R@K equality in tests). Pair with
    ``sort_by_length`` so batch maxima hug the row lengths.
    """
    l_t = d["txt_ids"].shape[1]
    r = d["img_feats"].shape[1]
    lab_len = d["img_mask"][:, :l_t].sum(axis=1)
    m_t = min(l_t, _round_up(max(d["cap_len"].max(), lab_len.max()), multiple))
    m_r = min(r, _round_up(d["img_len"].max(), multiple))
    if m_t == l_t and m_r == r:
        return d
    return {
        "txt_ids": d["txt_ids"][:, :m_t],
        "txt_mask": d["txt_mask"][:, :m_t],
        "txt_type": d["txt_type"][:, :m_t],
        "cap_len": d["cap_len"],
        "img_ids": d["img_ids"][:, :m_t],
        "img_mask": np.concatenate(
            [d["img_mask"][:, :m_t], d["img_mask"][:, l_t : l_t + m_r]], axis=1
        ),
        "img_type": d["img_type"][:, :m_t],
        "img_feats": d["img_feats"][:, :m_r],
        "img_len": d["img_len"],
    }


class BatchLoader:
    """Iterates static-size batches with shuffle + background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        sharding=None,
        num_threads: int = 4,
        sort_by_length: bool = False,
        trim_multiple: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.sharding = sharding
        self.num_threads = num_threads
        self.sort_by_length = sort_by_length
        self.trim_multiple = trim_multiple
        if sort_by_length and shuffle:
            raise ValueError(
                "sort_by_length and shuffle are mutually exclusive: length "
                "sorting fixes the visit order (it exists for eval encoding); "
                "a shuffled training loader must not silently lose its "
                "randomization"
            )

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def row_order(self, epoch: int = 0) -> np.ndarray:
        """The dataset-row order this epoch visits (callers that enable
        sort_by_length invert it to restore dataset order, e.g. the encode
        buffers in cli/test)."""
        n = len(self.dataset)
        if self.sort_by_length and hasattr(self.dataset, "length_hint"):
            hints = np.asarray([self.dataset.length_hint(i) for i in range(n)])
            return np.argsort(hints, kind="stable")
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        return order

    def _index_batches(self, epoch: int):
        n = len(self.dataset)
        order = self.row_order(epoch)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for s in range(0, stop, self.batch_size):
            idx = order[s : s + self.batch_size]
            if len(idx) < self.batch_size:  # pad final partial batch by wrap
                idx = np.concatenate([idx, order[: self.batch_size - len(idx)]])
            yield idx

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        """Prefetching iterator over one epoch.

        ``num_threads`` workers tensorize batches concurrently (the dataset's
        readers are thread-safe: pread-based native IO, thread-local TSV
        handles); results are consumed in order, with at most
        ``num_threads + prefetch`` batches in flight so memory stays bounded.
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        def to_batch(d):
            if self.trim_multiple > 0:
                d = trim_batch(d, self.trim_multiple)
            return batch_from_numpy(d, self.sharding)

        idx_iter = self._index_batches(epoch)
        if self.num_threads <= 1:
            for idx in idx_iter:
                yield to_batch(self.dataset.collate(idx))
            return

        with ThreadPoolExecutor(self.num_threads) as pool:
            inflight: "deque" = deque()
            for idx in idx_iter:
                inflight.append(pool.submit(self.dataset.collate, idx))
                if len(inflight) >= self.num_threads + self.prefetch:
                    yield to_batch(inflight.popleft().result())
            while inflight:
                yield to_batch(inflight.popleft().result())

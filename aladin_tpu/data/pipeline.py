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


def batch_from_numpy(d, sharding=None) -> Batch:
    put = (lambda x: jax.device_put(x, sharding)) if sharding is not None else jax.device_put
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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.sharding = sharding
        self.num_threads = num_threads

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self, epoch: int):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
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

        idx_iter = self._index_batches(epoch)
        if self.num_threads <= 1:
            for idx in idx_iter:
                yield batch_from_numpy(self.dataset.collate(idx), self.sharding)
            return

        with ThreadPoolExecutor(self.num_threads) as pool:
            inflight: "deque" = deque()
            for idx in idx_iter:
                inflight.append(pool.submit(self.dataset.collate, idx))
                if len(inflight) >= self.num_threads + self.prefetch:
                    yield batch_from_numpy(inflight.popleft().result(), self.sharding)
            while inflight:
                yield batch_from_numpy(inflight.popleft().result(), self.sharding)

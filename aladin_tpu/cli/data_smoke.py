"""Data-pipeline smoke / throughput tool.

Equivalent capability to the reference's standalone dataset main()
(ref:alad/dataset.py:381-554 - iterate the full train loader doing nothing).
Reports samples/s for the host pipeline (tensorize + collate + prefetch),
with and without the native C++ reader, so IO regressions are visible.

  python -m aladin_tpu.cli.data_smoke --synthetic            # quick check
  python -m aladin_tpu.cli.data_smoke --data_dir ... --img_feat_file ...
"""

from __future__ import annotations

import argparse
import time

from aladin_tpu.cli.common import add_shared_flags, build_tokenizer, prepare_synthetic, to_data_args
from aladin_tpu.data.dataset import RetrievalDataset
from aladin_tpu.data.pipeline import BatchLoader


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="data pipeline smoke")
    add_shared_flags(parser)
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=32)
    ns = parser.parse_args(argv)
    args = to_data_args(ns)
    if args.synthetic:
        args = prepare_synthetic(args, n_images=64)

    tokenizer = build_tokenizer(args)
    for native in (True, False):
        ds = RetrievalDataset(tokenizer, args, "train", is_train=True, use_native_io=native)
        mode = "native" if (native and ds._native is not None) else "python"
        # thread-pool scaling sweep: input-bound vs compute-bound is decided
        # by comparing the best samples/s here against the train-step rate
        for threads in sorted({1, args.num_workers}):
            loader = BatchLoader(ds, ns.batch_size, shuffle=True, num_threads=threads)
            n = 0
            t0 = time.time()
            for _ in range(ns.epochs):
                for batch in loader.epoch(0):
                    n += batch.txt_ids.shape[0]
            dt = time.time() - t0
            print(f"[{mode} x{threads} threads] {n} samples in {dt:.2f}s -> {n / dt:.0f} samples/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Streaming recall at beyond-matrix scale on one chip.

The dense evaluation path (eval/retrieval.py) materializes the (N_im, N_cap)
f32 score matrix — at the serving-scale corpus the README claims one chip
can hold (~120k image sets; a dp=8 mesh ~1M), R@K evaluation would need a
100k x 500k x 4 B = 200 GB matrix. eval/streaming.py computes the SAME ranks
(test-locked against the materialized oracle) from streamed score tiles and
per-query counters: device memory = embeddings + one tile + (N, 5) int32.

This bench runs the matching-head streaming recall at 100k images x 500k
captions (unit-norm synthetic embeddings, GT planted by construction at a
controlled margin so recall is ~100% — correctness is the oracle tests' job;
this measures throughput) and reports pairs/s over the 5e10-pair sweep.

    python benchmarks/streaming_recall_bench.py [--n_img 100000] [--d 768]

Axon-relay timing rules apply (one scalar fetch to close, ~25 ms RT).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n_img", type=int, default=0,
                   help="0 = auto: 100k on TPU, 2k elsewhere")
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--cap_block", type=int, default=32768)
    p.add_argument("--cpi", type=int, default=5)
    ns = p.parse_args()

    from aladin_tpu.eval.streaming import streaming_matching_recall

    on_tpu = jax.default_backend() == "tpu"
    n_img = ns.n_img or (100_000 if on_tpu else 2_000)
    n_cap = n_img * ns.cpi

    # device-generated corpus: random unit captions; each image = its first
    # GT caption nudged toward it so GT outranks the noise (recall sanity)
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    gen = jax.jit(lambda: _gen(k0, k1, n_img, n_cap, ns.d, ns.cpi))
    ims, caps = gen()
    ims.block_until_ready()

    t0 = time.time()
    m = streaming_matching_recall(ims, caps, ns.cpi, cap_block=ns.cap_block)
    elapsed = time.time() - t0 - 0.025
    pairs = float(n_img) * n_cap

    out = {
        "metric": "streaming_recall_pairs_per_s",
        "value": round(pairs / elapsed / 1e6, 2),
        "unit": "Mpairs/s",
        "n_img": n_img,
        "n_cap": n_cap,
        "elapsed_s": round(elapsed, 2),
        "dense_matrix_would_be_GB": round(pairs * 4 / 1e9, 1),
        "rsum": round(m["rsum"], 1),
        "t2i_r1": round(m["t2i_r1"], 2),
    }
    print(json.dumps(out))
    return 0


def _gen(k0, k1, n_img, n_cap, d, cpi):
    caps = jax.random.normal(k0, (n_cap, d), jnp.float32)
    caps = caps / jnp.linalg.norm(caps, axis=1, keepdims=True)
    noise = jax.random.normal(k1, (n_img, d), jnp.float32)
    noise = noise / jnp.linalg.norm(noise, axis=1, keepdims=True)
    ims = 0.9 * caps[::cpi] + 0.45 * noise
    ims = ims / jnp.linalg.norm(ims, axis=1, keepdims=True)
    return ims, caps


if __name__ == "__main__":
    raise SystemExit(main())

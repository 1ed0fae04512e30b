"""Headline benchmark: fused alignment-head all-pairs scoring throughput.

Workload: the COCO 5k-test retrieval product - 5,000 images x 25,000
captions, 33 regions x 47 words per pair, D=768 - scored with the MrSw
aggregation (max over regions, sum over words), i.e. the reference's
alignment-head evaluation (ref:alad/evaluation.py:199-211) in one fused
Pallas kernel on a single TPU chip.

Baseline: the reference reports 0.098 s per 1k-fold alignment-head retrieval
pass on GPU (alad/plots/plot_efficiency_vs_effectiveness.py:13), i.e.
1,000 x 5,000 pairs / 0.098 s = 51.02M image-caption pairs/s. vs_baseline is
our pairs/s over that number.

Measurement notes (axon relay): data is generated ON DEVICE (host->device
uploads crawl through the tunnel), timing forces a scalar fetch (the relay's
block_until_ready does not block) and subtracts the ~25 ms fetch round trip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

BASELINE_PAIRS_PER_S = 1000 * 5000 / 0.098  # reference GPU alignment head


def main() -> None:
    import jax
    import jax.numpy as jnp

    from aladin_tpu.ops.pallas.alignment_kernel import mrsw_scores_bucketed
    from aladin_tpu.ops.alignment import score_all_pairs

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        ni, nc, r, w, d = 5000, 25000, 34, 50, 768
    else:  # CPU fallback keeps the harness runnable anywhere
        ni, nc, r, w, d = 100, 500, 34, 50, 64

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    gen = jax.jit(
        lambda: (
            jax.random.normal(keys[0], (ni, r, d), jnp.float32),
            jax.random.normal(keys[1], (nc, w, d), jnp.float32),
            jax.random.randint(keys[2], (ni,), 5, r + 1, jnp.int32),
            jax.random.randint(keys[3], (nc,), 4, w + 1, jnp.int32),
        )
    )
    im, ss, il, sl = gen()
    float(il[0])  # force materialization (tunnel warmup)

    if on_tpu:
        # Production serving path: int8 quantized scoring (394-TOPS MXU mode)
        # with caption-length bucketing (identical scores, skips padded-word
        # lanes; eval/retrieval auto-engages it the same way). Accuracy is
        # test-backed: tests/test_eval.py::test_int8_scoring_rank_parity
        # asserts R@1/5/10 deltas <= 0.1pp and >0.9999 score correlation vs
        # f32; test_bucketed_scoring_exact_parity locks bucketing = exact.
        # Lengths stay uniform 4..50 (the series' workload definition);
        # the realistic COCO mix (mean ~14) runs faster still - 203M pairs/s
        # measured (see README).
        f = lambda: mrsw_scores_bucketed(im, ss, il, sl, compute_dtype=jnp.int8)  # noqa: E731
    else:
        f = lambda: score_all_pairs(im, ss, il, sl, "MrSw", 100)  # noqa: E731

    out = f()
    float(out[:2, :2].sum())  # warmup compile + execute
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = f()
        float(out[:2, :2].sum())
        best = min(best, time.time() - t0 - 0.025)
    pairs_per_s = ni * nc / best

    print(
        json.dumps(
            {
                "metric": "alignment_head_all_pairs_scoring (5k x 25k COCO test, MrSw int8 bucketed, 1 chip)"
                if on_tpu
                else "alignment_head_all_pairs_scoring (CPU fallback, tiny)",
                "value": round(pairs_per_s / 1e6, 2),
                "unit": "M pairs/s",
                "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())

"""Serial per-query retrieval latency measurement.

The reference's efficiency claim is per-query latency on a 1k-image COCO
fold (ref:alad/plots/plot_efficiency_vs_effectiveness.py:12-15): 0.023 s
per query for the matching head (global dot products + sort) and 0.098 s
for the alignment head (full region-word scoring), on the paper's GPU.
This module is the shared measurement engine behind
``benchmarks/query_latency_bench.py`` and ``cli/parity`` — one definition
of "serial per-query latency" so every number the repo quotes for it comes
from the same code.

Honest serial timing on an async device: K single-query searches run one
after another inside one jitted ``lax.scan`` whose body data-depends on the
previous step's result (no cross-query batching is possible), timed with
one scalar fetch minus the host-link round trip. When the whole scan
finishes under the round trip the measurement has saturated and ``None`` is
returned instead of a fabricated number.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from aladin_tpu.eval.search import Corpus
from aladin_tpu.ops.alignment import alignment_scores

#: per-query latency of the reference's two operating points (seconds,
#: 1k-image fold, paper GPU; ref:alad/plots/plot_efficiency_vs_effectiveness.py:13)
REF_MATCHING_S = 0.023
REF_ALIGNMENT_S = 0.098

MODES = ("matching", "two_stage", "full_alignment")


def make_serial_runner(mode: str, *, shortlist: int = 100, k: int = 10,
                       aggregation: str = "MrSw"):
    """A jitted ``run(q_sets, q_lens, corpus) -> top indices`` that executes
    the queries strictly serially (each scan step consumes the previous
    result). The corpus is an ARGUMENT, not a closure capture: closed-over
    arrays are baked into the jaxpr as constants — a 20k-image corpus would
    embed ~2.6 GB into every compiled scan."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")

    @jax.jit
    def run(qs, ql, corpus: Corpus):
        kk = min(k, corpus.size)  # tiny fixtures: never ask top_k for more

        def matching(q, l):
            sims = q[0] @ corpus.globals.T
            return jax.lax.top_k(sims, kk)

        def two_stage(q, l):
            sims = q[0] @ corpus.globals.T
            _, short = jax.lax.top_k(sims, min(shortlist, corpus.size))
            cands = jnp.take(corpus.token_sets, short, axis=0)
            clens = jnp.take(corpus.lengths, short)
            a = alignment_scores(
                cands, q[None], clens, l[None], aggregation, normalized=True
            )[:, 0]
            s, pos = jax.lax.top_k(a, min(kk, short.shape[0]))
            return s, jnp.take(short, pos)

        def full_alignment(q, l):
            a = alignment_scores(
                corpus.token_sets, q[None], corpus.lengths, l[None],
                aggregation, normalized=True,
            )[:, 0]
            return jax.lax.top_k(a, kk)

        fn = {"matching": matching, "two_stage": two_stage,
              "full_alignment": full_alignment}[mode]

        def body(carry, x):
            q, l = x
            # data-depend on the previous result so steps cannot overlap
            s, idx = fn(q + carry * 0.0, l)
            return s[0], idx[0]

        _, tops = jax.lax.scan(body, jnp.float32(0), (qs, ql))
        return tops

    return run


def serial_query_latency(
    corpus: Corpus,
    query_sets,
    query_lens,
    *,
    mode: str,
    shortlist: int = 100,
    k: int = 10,
    aggregation: str = "MrSw",
    n_serial: int = 64,
    repeats: int = 3,
    host_rt: Optional[float] = None,
) -> Tuple[Optional[float], str]:
    """Measured seconds per serial query, or ``(None, note)`` when the scan
    completes under the host-link round trip (measurement floor).

    ``host_rt``: seconds to subtract for the scalar-fetch round trip.
    None = auto (the ~25 ms axon tunnel RT on TPU, 0 elsewhere).
    """
    if host_rt is None:
        host_rt = 0.025 if jax.default_backend() == "tpu" else 0.0
    qs = jnp.asarray(query_sets)[:n_serial].astype(jnp.float32)
    ql = jnp.asarray(query_lens, jnp.int32)[:n_serial]
    n = int(qs.shape[0])
    run = make_serial_runner(mode, shortlist=shortlist, k=k,
                             aggregation=aggregation)
    int(run(qs, ql, corpus)[-1])  # compile + warm the tunnel AND fetch plan
    best = float("inf")
    for _ in range(repeats):  # min-of-N: the first post-compile execution
        t0 = time.time()      # can carry one-time relay overhead (~0.35 s)
        int(run(qs, ql, corpus)[-1])
        best = min(best, time.time() - t0 - host_rt)
    if best <= 0:
        return None, "below measurement floor (dt <= host round trip)"
    return best / n, ""

"""Two-stage retrieval search: matching-head shortlist + alignment rerank.

This is the deployment mode the ALADIN paper's efficiency/effectiveness
trade-off is about (ref:alad/plots/plot_efficiency_vs_effectiveness.py:12-15
— matching head 0.023 s/query, alignment head 0.098 s/query on a 1k-image
fold; ref:README.md:96-105): the matching head's single global embedding per
item makes the corpus *indexable* — one dot product per (query, item) —
while the fine-grained alignment head re-scores only a small shortlist.
The reference ships the two heads and evaluates each in isolation
(ref:alad/test.py:253-276); the composed serve-time pipeline exists only as
the paper's latency plot. Here it is a first-class API:

  1. Stage 1 (shortlist): ``q_glob @ corpus.globals.T`` + ``lax.top_k`` —
     O(N·D) per query on the MXU.
  2. Stage 2 (rerank): gather the shortlist's per-token sets and run the
     TERAN-style region-word aggregation (ops/alignment.alignment_scores,
     ref:alad/loss.py:97-149) on (query, candidate) PAIRS only — O(K·R·W·D)
     per query instead of O(N·R·W·D) for full alignment scoring.

TPU-first structure: the corpus lives in HBM as bf16 token sets + f32
globals; a whole query batch runs as ONE jitted program (shortlist, gather,
rerank, final top-k fused by XLA); serial per-query latency is measured by
scanning single queries on device (benchmarks/query_latency_bench.py).

Exactness: with ``shortlist >= corpus size`` the two-stage result equals
full alignment-head ranking (test-locked, tests/test_search.py); at
shortlist K it is the standard retrieve-and-rerank approximation whose
recall floor is the matching head's R@K.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from aladin_tpu.ops.alignment import alignment_scores
from aladin_tpu.ops.similarity import l2norm


@jax.tree_util.register_pytree_node_class
@dataclass
class Corpus:
    """One modality's indexed corpus, device-resident.

    ``token_sets`` (N, S, D): per-token embeddings with the global matching
    embedding at slot 0 (the reference's I-CLS/T-CLS packing,
    ref:alad/evaluation.py:115-128) — exactly what eval/encode.py produces.
    ``globals`` (N, D): slot-0 rows, kept separately in f32 for the stage-1
    dot products. ``lengths`` (N,): true token counts incl. specials.
    """

    token_sets: Array
    globals: Array
    lengths: Array

    def tree_flatten(self):
        return (self.token_sets, self.globals, self.lengths), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def size(self) -> int:
        return self.token_sets.shape[0]


def build_corpus(embs, lengths, store_dtype=jnp.bfloat16) -> Corpus:
    """Index one modality from eval/encode.py buffers.

    ``embs`` (N, S, D) numpy/jax with the slot-0 global packing; token sets
    are L2-normalized once at build time (the model already normalizes, but
    converter-loaded or f32-roundtripped buffers may be off by eps) so
    queries skip per-search normalization. Stored bf16: halves HBM and the
    stage-2 gather traffic; scores accumulate in f32 on the MXU.
    """
    embs = jnp.asarray(embs)
    sets = l2norm(embs, eps=1e-12).astype(store_dtype)
    globs = embs[:, 0, :].astype(jnp.float32)
    globs = globs / jnp.maximum(jnp.linalg.norm(globs, axis=-1, keepdims=True), 1e-12)
    return Corpus(sets, globs, jnp.asarray(lengths, jnp.int32))


def _rerank_i2t(q_sets, q_lens, cand_sets, cand_lens, aggregation):
    """(Q, R, D) image queries vs (Q, K, W, D) caption candidates -> (Q, K)."""
    def one(im, il, caps, cls):
        return alignment_scores(
            im[None], caps, il[None], cls, aggregation, normalized=True
        )[0]

    return jax.vmap(one)(q_sets, q_lens, cand_sets, cand_lens)


def _rerank_t2i(q_sets, q_lens, cand_sets, cand_lens, aggregation):
    """(Q, W, D) caption queries vs (Q, K, R, D) image candidates -> (Q, K)."""
    def one(cap, cl, ims, ils):
        return alignment_scores(
            ims, cap[None], ils, cl[None], aggregation, normalized=True
        )[:, 0]

    return jax.vmap(one)(q_sets, q_lens, cand_sets, cand_lens)


@functools.partial(
    jax.jit, static_argnames=("direction", "k", "shortlist", "rerank", "aggregation")
)
def _search_batch(
    corpus: Corpus,
    q_sets: Array,
    q_lens: Array,
    *,
    direction: str,
    k: int,
    shortlist: int,
    rerank: bool,
    aggregation: str,
) -> Tuple[Array, Array]:
    q_glob = q_sets[:, 0, :].astype(jnp.float32)
    q_glob = q_glob / jnp.maximum(jnp.linalg.norm(q_glob, axis=-1, keepdims=True), 1e-12)
    # HIGHEST: the TPU default truncates f32 matmuls to bf16, which reorders
    # near-tied candidates; stage 1 is tiny (N x D) so full f32 is free here
    sims = jnp.matmul(q_glob, corpus.globals.T,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    if not rerank:
        return jax.lax.top_k(sims, k)

    _, short_idx = jax.lax.top_k(sims, shortlist)  # (Q, K)
    cand_sets = jnp.take(corpus.token_sets, short_idx, axis=0)  # (Q, K, S, D)
    cand_lens = jnp.take(corpus.lengths, short_idx)  # (Q, K)
    q_norm = l2norm(q_sets, eps=1e-12)
    fn = _rerank_i2t if direction == "i2t" else _rerank_t2i
    align = fn(q_norm, q_lens, cand_sets, cand_lens, aggregation)  # (Q, K)
    best, pos = jax.lax.top_k(align, k)
    return best, jnp.take_along_axis(short_idx, pos, axis=1)


def search(
    corpus: Corpus,
    query_sets,
    query_lens,
    *,
    direction: str,
    k: int = 10,
    shortlist: int = 100,
    rerank: bool = True,
    aggregation: str = "MrSw",
    query_chunk: Optional[int] = 64,
) -> Tuple[np.ndarray, np.ndarray]:
    """Retrieve the top-``k`` corpus items for each query.

    Args:
      corpus: the indexed OTHER modality (images for ``direction='t2i'``,
        captions for ``'i2t'``).
      query_sets: (Q, S, D) query token sets, slot-0 global packing (an
        eval/encode.py buffer slice).
      query_lens: (Q,) true lengths.
      direction: 'i2t' (image query, caption corpus) or 't2i'.
      k: results per query.
      shortlist: stage-1 candidate count (clamped to corpus size). The
        two-stage result equals full alignment ranking when
        ``shortlist >= corpus.size``.
      rerank: False = matching head only (the reference's fastest
        operating point, 0.023 s/query; here one fused matmul+top_k).
      query_chunk: queries per jitted program — bounds the (chunk,
        shortlist, S, D) bf16 gather at ~800 MB with the defaults at
        VinVL-base image widths (S=84); None = all at once.

    Returns (scores (Q, k) f32, indices (Q, k) int32) as numpy.
    """
    if direction not in ("i2t", "t2i"):
        raise ValueError(f"direction must be 'i2t' or 't2i', got {direction!r}")
    query_sets = jnp.asarray(query_sets)
    query_lens = jnp.asarray(query_lens, jnp.int32)
    n_q = query_sets.shape[0]
    if n_q == 0:  # empty shard/bucket: return empty results, not a crash
        # Clamp exactly as the non-empty path does so shapes are consistent
        # for callers that concatenate per-shard/per-bucket results.
        kk = min(k, min(shortlist, corpus.size) if rerank else corpus.size)
        return (np.zeros((0, kk), np.float32), np.zeros((0, kk), np.int32))
    shortlist = min(shortlist, corpus.size)
    k = min(k, corpus.size if not rerank else shortlist)
    chunk = n_q if not query_chunk else min(query_chunk, n_q)

    scores, idx = [], []
    for lo in range(0, n_q, chunk):
        qs = query_sets[lo : lo + chunk]
        ql = query_lens[lo : lo + chunk]
        pad = chunk - qs.shape[0]
        if pad:  # keep one compiled shape for the tail
            qs = jnp.pad(qs, ((0, pad), (0, 0), (0, 0)))
            ql = jnp.pad(ql, (0, pad), constant_values=4)
        s, i = _search_batch(
            corpus, qs, ql, direction=direction, k=k,
            shortlist=shortlist, rerank=rerank, aggregation=aggregation,
        )
        scores.append(s[: chunk - pad])
        idx.append(i[: chunk - pad])
    # chunks stay on device (async dispatch pipelines them); ONE fetch at the
    # end — per-chunk np.asarray would serialize on the host link RT
    return (
        np.asarray(jnp.concatenate(scores)),
        np.asarray(jnp.concatenate(idx)),
    )


def sharded_search(
    mesh,
    corpus: Corpus,
    query_sets,
    query_lens,
    *,
    direction: str,
    k: int = 10,
    shortlist: int = 100,
    rerank: bool = True,
    aggregation: str = "MrSw",
) -> Tuple[np.ndarray, np.ndarray]:
    """Scale-out :func:`search`: the corpus sharded over every axis of a
    device mesh, queries replicated.

    Each device runs the two-stage pipeline against its corpus shard
    (stage-1 top-``shortlist`` within the shard, local rerank, local
    top-``k``); the per-shard k-bests concatenate along the shard axis and a
    final top-k merge picks the global winners. This is the standard
    distributed-MIPS merge: EXACT for the matching-only stage (a global
    top-k is the merge of per-shard top-ks), and for the reranked result it
    is the per-shard retrieve-and-rerank approximation — each shard gets its
    own ``shortlist`` budget, so the candidate pool is a SUPERSET of the
    single-device pipeline's: equal results whenever ``shortlist`` covers
    each shard, and where budgets bind the sharded top-k rerank scores
    dominate the single-device ones pointwise (both bounds test-locked on
    the 8-device CPU mesh, incl. an adversarial-placement divergence case —
    tests/test_search.py::test_sharded_search_divergence_is_bounded).

    The corpus N axis pads to the mesh size; padded rows are masked to -inf
    at stage 1 so they can never enter a shortlist. HBM per device is
    ~N/n_dev of the corpus — this is the path for corpora that exceed one
    chip (a 16 GB v5e holds ~120k image sets at VinVL widths; a dp=8 mesh
    holds ~1M).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard_map = jax.shard_map

    if direction not in ("i2t", "t2i"):
        raise ValueError(f"direction must be 'i2t' or 't2i', got {direction!r}")
    axes = tuple(mesh.axis_names)
    n_dev = mesh.size
    n = corpus.size
    pad = (-n) % n_dev
    sets = jnp.pad(corpus.token_sets, ((0, pad), (0, 0), (0, 0)))
    globs = jnp.pad(corpus.globals, ((0, pad), (0, 0)))
    lens = jnp.pad(corpus.lengths, (0, pad), constant_values=4)
    shard_n = (n + pad) // n_dev
    shortlist = min(shortlist, shard_n)
    k_local = min(k, shortlist if rerank else shard_n)

    cap_sh = NamedSharding(mesh, P(axes))
    rep = NamedSharding(mesh, P())
    sets = jax.device_put(sets, cap_sh)
    globs = jax.device_put(globs, cap_sh)
    lens = jax.device_put(lens, cap_sh)
    q_sets = jax.device_put(jnp.asarray(query_sets), rep)
    q_lens = jax.device_put(jnp.asarray(query_lens, jnp.int32), rep)

    def local(sets_s, globs_s, lens_s, qs, ql):
        # flatten the (possibly multi-axis) shard index into a row offset
        offset = jnp.int32(0)
        for ax in axes:
            offset = offset * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
        offset = offset * shard_n
        q_glob = qs[:, 0, :].astype(jnp.float32)
        q_glob = q_glob / jnp.maximum(
            jnp.linalg.norm(q_glob, axis=-1, keepdims=True), 1e-12)
        sims = jnp.matmul(q_glob, globs_s.T, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        valid = (offset + jnp.arange(shard_n)) < n  # mask mesh padding rows
        sims = jnp.where(valid[None, :], sims, -jnp.inf)
        if not rerank:
            s, i = jax.lax.top_k(sims, k_local)
            return s, i + offset
        _, short = jax.lax.top_k(sims, shortlist)  # (Q, S_l)
        cands = jnp.take(sets_s, short, axis=0)
        clens = jnp.take(lens_s, short)
        q_norm = l2norm(qs, eps=1e-12)
        fn = _rerank_i2t if direction == "i2t" else _rerank_t2i
        align = fn(q_norm, ql, cands, clens, aggregation)
        # a padded/invalid row can only be shortlisted when the shard has
        # fewer than `shortlist` real rows; kill it in the merge
        short_valid = (offset + short) < n
        align = jnp.where(short_valid, align, -jnp.inf)
        s, pos = jax.lax.top_k(align, k_local)
        return s, jnp.take_along_axis(short, pos, axis=1) + offset

    spec_n = P(axes)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec_n, spec_n, spec_n, P(), P()),
        out_specs=(P(None, axes), P(None, axes)),
    )
    s_all, i_all = fn(sets, globs, lens, q_sets, q_lens)  # (Q, n_dev*k_local)
    best, pos = jax.lax.top_k(s_all, min(k, s_all.shape[1]))
    idx = jnp.take_along_axis(i_all, pos, axis=1)
    return np.asarray(best), np.asarray(idx, np.int32)

"""Streaming recall (eval/streaming.py) vs the materialized oracle: the
ranks must match ranks_from_score_matrix exactly on random (tie-free)
embeddings, for both heads, any block size, solo and mesh (VERDICT r4
weak #3 / SURVEY S5.7 streaming reduction over the corpus axis)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aladin_tpu.eval.recall import ranks_from_score_matrix
from aladin_tpu.eval.streaming import (
    streaming_alignment_ranks,
    streaming_matching_ranks,
    streaming_matching_recall,
)
from aladin_tpu.ops.similarity import l2norm

N, CPI, D = 24, 5, 32


@pytest.fixture(scope="module")
def globs():
    rng = np.random.RandomState(0)
    ims = rng.randn(N, D).astype(np.float32)
    caps = rng.randn(N * CPI, D).astype(np.float32)
    ims /= np.linalg.norm(ims, axis=1, keepdims=True)
    caps /= np.linalg.norm(caps, axis=1, keepdims=True)
    return ims, caps


def oracle_ranks(ims, caps):
    scores = jnp.asarray(ims) @ jnp.asarray(caps).T
    i2t, t2i = ranks_from_score_matrix(scores, CPI)
    return np.asarray(i2t), np.asarray(t2i)


@pytest.mark.parametrize("cap_block", [7, 40, 1024])
def test_matching_streaming_matches_oracle(globs, cap_block):
    ims, caps = globs
    oi, ot = oracle_ranks(ims, caps)
    si, st = streaming_matching_ranks(ims, caps, CPI, cap_block=cap_block)
    np.testing.assert_array_equal(si, oi)
    np.testing.assert_array_equal(st, ot)


def test_matching_streaming_recall_dict(globs):
    from aladin_tpu.eval.recall import compute_recall

    ims, caps = globs
    # compute_recall takes the duplicated 5-per-image layout
    dup = np.repeat(ims, CPI, axis=0)
    want = compute_recall(dup, caps, CPI)
    got = streaming_matching_recall(ims, caps, CPI, cap_block=32)
    assert got == want


def test_matching_topk_carry(globs):
    ims, caps = globs
    scores = np.asarray(jnp.asarray(ims) @ jnp.asarray(caps).T)
    want = np.argsort(-scores, axis=1)[:, :10]
    _, _, (tv, tc) = streaming_matching_ranks(ims, caps, CPI, cap_block=16,
                                              topk=10)
    np.testing.assert_array_equal(tc, want)
    np.testing.assert_allclose(tv, np.take_along_axis(scores, want, 1),
                               rtol=1e-6)


def test_matching_streaming_mesh_matches_solo(globs):
    from aladin_tpu.parallel.mesh import create_mesh

    ims, caps = globs
    mesh = create_mesh("dp=8")
    oi, ot = oracle_ranks(ims, caps)
    si, st = streaming_matching_ranks(ims, caps, CPI, cap_block=40, mesh=mesh)
    np.testing.assert_array_equal(si, oi)
    np.testing.assert_array_equal(st, ot)


def test_matching_mesh_topk(globs):
    from aladin_tpu.parallel.mesh import create_mesh

    ims, caps = globs
    mesh = create_mesh("dp=8")
    scores = np.asarray(jnp.asarray(ims) @ jnp.asarray(caps).T)
    want = np.argsort(-scores, axis=1)[:, :5]
    _, _, (tv, tc) = streaming_matching_ranks(ims, caps, CPI, cap_block=64,
                                              topk=5, mesh=mesh)
    np.testing.assert_array_equal(tc, want)


@pytest.mark.parametrize("aggregation", ["MrSw", "symm"])
def test_alignment_streaming_matches_oracle(aggregation):
    from aladin_tpu.ops.alignment import score_all_pairs

    rng = np.random.RandomState(1)
    s_im, s_cap = 9, 12
    img_sets = rng.randn(N * CPI, s_im, D).astype(np.float32)
    cap_seqs = rng.randn(N * CPI, s_cap, D).astype(np.float32)
    # duplicated image rows, as the encode buffers lay them out
    img_sets = np.repeat(img_sets[::CPI], CPI, axis=0)
    img_lens = np.repeat(rng.randint(4, s_im + 1, N), CPI).astype(np.int32)
    cap_lens = rng.randint(4, s_cap + 1, N * CPI).astype(np.int32)

    ims = l2norm(jnp.asarray(img_sets[::CPI]), eps=1e-12)
    caps = l2norm(jnp.asarray(cap_seqs), eps=1e-12)
    dense = score_all_pairs(ims, caps, jnp.asarray(img_lens[::CPI]),
                            jnp.asarray(cap_lens), aggregation, 24,
                            normalized=True)
    oi, ot = ranks_from_score_matrix(dense, CPI)

    si, st = streaming_alignment_ranks(
        img_sets, cap_seqs, img_lens, cap_lens, aggregation, CPI,
        cap_block=48, use_pallas=False)
    np.testing.assert_array_equal(si, np.asarray(oi))
    np.testing.assert_array_equal(st, np.asarray(ot))


@pytest.mark.slow
def test_alignment_streaming_pallas_interpret_matches():
    """The Pallas MrSw kernel tile path (interpret mode off-TPU) agrees with
    the XLA tile path through the streaming evaluator."""
    rng = np.random.RandomState(2)
    n = 8
    img_sets = np.repeat(rng.randn(n, 9, D).astype(np.float32), CPI, axis=0)
    cap_seqs = rng.randn(n * CPI, 12, D).astype(np.float32)
    img_lens = np.repeat(rng.randint(4, 10, n), CPI).astype(np.int32)
    cap_lens = rng.randint(4, 13, n * CPI).astype(np.int32)
    a = streaming_alignment_ranks(img_sets, cap_seqs, img_lens, cap_lens,
                                  "MrSw", CPI, cap_block=16, use_pallas=False)
    b = streaming_alignment_ranks(img_sets, cap_seqs, img_lens, cap_lens,
                                  "MrSw", CPI, cap_block=16, use_pallas=True,
                                  interpret=True)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_compute_recall_auto_engages_streaming(globs, monkeypatch):
    """compute_recall transparently streams past STREAMING_SCORE_BYTES —
    same dict, no dense (N_im, N_cap) matrix (the caller-facing surface of
    the beyond-HBM path)."""
    import aladin_tpu.eval.recall as recall_mod

    ims, caps = globs
    dup = np.repeat(ims, CPI, axis=0)
    want = recall_mod.compute_recall(dup, caps, CPI)
    monkeypatch.setattr(recall_mod, "STREAMING_SCORE_BYTES", 1)
    got = recall_mod.compute_recall(dup, caps, CPI)
    assert got == want


def test_alignment_streaming_mesh_matches_solo():
    """Alignment-head streaming over the 8-device mesh: caption blocks
    sharded, i2t counters psum'd — ranks equal the solo sweep (and hence
    the materialized oracle it is test-locked against)."""
    from aladin_tpu.parallel.mesh import create_mesh

    rng = np.random.RandomState(3)
    n = 12
    img_sets = np.repeat(rng.randn(n, 9, D).astype(np.float32), CPI, axis=0)
    cap_seqs = rng.randn(n * CPI, 12, D).astype(np.float32)
    img_lens = np.repeat(rng.randint(4, 10, n), CPI).astype(np.int32)
    cap_lens = rng.randint(4, 13, n * CPI).astype(np.int32)
    solo = streaming_alignment_ranks(img_sets, cap_seqs, img_lens, cap_lens,
                                     "MrSw", CPI, cap_block=16,
                                     use_pallas=False)
    mesh = create_mesh("dp=8")
    dist = streaming_alignment_ranks(img_sets, cap_seqs, img_lens, cap_lens,
                                     "MrSw", CPI, cap_block=16,
                                     use_pallas=False, mesh=mesh)
    np.testing.assert_array_equal(dist[0], solo[0])
    np.testing.assert_array_equal(dist[1], solo[1])

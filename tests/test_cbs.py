"""Constrained beam search tests: FSM builder, constraint filter, and the
state-partitioned decode actually enforcing constraints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aladin_tpu.tasks.cbs import (
    ConstraintFilter,
    FiniteStateMachineBuilder,
    adjacency_to_next_state,
    cbs_decode,
    num_constraints_satisfied,
    select_best_beam_with_constraints,
)
from tests.test_captioning import VOCAB, make_captioner


def test_fsm_single_token_constraints():
    b = FiniteStateMachineBuilder(vocab_size=10)
    # constraint 0: token 3; constraint 1: token 5 or 6
    nxt, n_states = b.build([[[3]], [[5], [6]]])
    assert n_states == 4
    assert nxt[0, 3] == 1  # satisfy c0
    assert nxt[0, 5] == 2 and nxt[0, 6] == 2  # satisfy c1 (either form)
    assert nxt[1, 5] == 3  # c0 then c1
    assert nxt[2, 3] == 3
    assert nxt[0, 7] == 0  # irrelevant token self-loops
    assert nxt[3, 3] == 3  # all satisfied absorbs


def test_fsm_multi_token_chain():
    b = FiniteStateMachineBuilder(vocab_size=10)
    nxt, n_states = b.build([[[3, 4]]])  # one 2-token constraint
    assert n_states == 3  # 2 main + 1 chain substate
    sub = 2
    assert nxt[0, 3] == sub
    assert nxt[sub, 4] == 1  # completes the chain
    assert nxt[sub, 7] == 0  # reset on mismatch
    assert nxt[0, 4] == 0


def test_adjacency_conversion():
    adj = np.zeros((2, 2, 4), bool)
    adj[0, 0, :] = True
    adj[0, 0, 2] = False
    adj[0, 1, 2] = True
    adj[1, 1, :] = True
    nxt = adjacency_to_next_state(adj)
    assert nxt[0, 2] == 1 and nxt[0, 1] == 0 and nxt[1, 2] == 1


def test_num_constraints_satisfied():
    assert list(num_constraints_satisfied(np.array([0, 1, 2, 3]), 2)) == [0, 1, 1, 2]


def test_constraint_filter():
    f = ConstraintFilter(max_given_constraints=2)
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30], [5, 5, 9, 9]],
                     np.float32)
    names = ["dog", "background", "cat", "dog"]
    scores = np.array([0.9, 0.95, 0.8, 0.7])
    out = f(boxes, names, scores)
    assert out[0] == "dog"  # blacklist removed despite top score
    assert "cat" in out
    assert len(out) <= 2


def test_cbs_decode_enforces_constraint(rng):
    """With a random model, unconstrained beams land in state 0; the
    constraint-satisfying states only contain captions that used the
    constrained token."""
    model, params, od_ids, od_seg, feats, mask, max_seq_a = make_captioner(rng)
    v = len(VOCAB)
    builder = FiniteStateMachineBuilder(vocab_size=v)
    dog = VOCAB["dog"]
    nxt, n_states = builder.build([[[dog]]])  # require the word "dog"
    next_state = jnp.array(np.broadcast_to(nxt, (2, n_states, v)).copy())

    toks, scores, finished = cbs_decode(
        model, params, od_ids, od_seg, feats, mask, next_state,
        max_steps=max_seq_a - 1, num_beams=2, num_states=n_states,
        cls_id=VOCAB["[CLS]"], sep_id=VOCAB["[SEP]"], mask_id=VOCAB["[MASK]"],
        pad_id=VOCAB["[PAD]"],
    )
    toks, scores = np.asarray(toks), np.asarray(scores)
    assert toks.shape == (2, n_states, 2, max_seq_a)
    # every live beam in state 1 contains "dog"; state-0 beams do not
    for i in range(2):
        for kk in range(2):
            if scores[i, 1, kk] > -1e8:
                assert dog in toks[i, 1, kk], toks[i, 1, kk]
            if scores[i, 0, kk] > -1e8:
                assert dog not in toks[i, 0, kk]

    best_toks, best_scores = select_best_beam_with_constraints(
        toks, scores, np.array([1, 1]), min_constraints_to_satisfy=1
    )
    for i in range(2):
        assert dog in best_toks[i]
        assert np.isfinite(best_scores[i])

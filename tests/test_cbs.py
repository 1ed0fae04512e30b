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


def _run(nxt, tokens, state=0):
    for t in tokens:
        state = int(nxt[state, t])
    return state


def test_fsm_single_token_shared_with_chain_prefix():
    """'snow' (c0, token 3) and 'snowboard' (c1, [3, 4]): consuming 3 must
    earn bit(c0) whether or not the chain completes, and 3-then-4 earns
    BOTH bits. Regression: the chain's first-token write used to clobber
    the single-token transition, making c0 unsatisfiable."""
    b = FiniteStateMachineBuilder(vocab_size=10)
    nxt, _ = b.build([[[3]], [[3, 4]]])
    assert _run(nxt, [3, 7]) == 1          # 'snow hill' -> bit0
    assert _run(nxt, [3, 4]) == 3          # 'snow board' -> both bits
    assert _run(nxt, [7, 3, 7, 3, 4]) == 3  # re-entry after reset


def test_fsm_chain_final_token_is_single_constraint():
    """'truck' (c0, token 4) and 'fire truck' (c1, [3, 4]): 'fire truck'
    satisfies BOTH constraints (the final token completes c0 too)."""
    b = FiniteStateMachineBuilder(vocab_size=10)
    nxt, _ = b.build([[[4]], [[3, 4]]])
    assert _run(nxt, [3, 4]) == 3          # both bits
    assert _run(nxt, [4]) == 1             # 'truck' alone -> bit0
    assert _run(nxt, [3, 7]) == 0          # 'fire x' -> nothing


def test_fsm_substate_mid_chain_other_constraint():
    """At a chain substate, a token completing an unrelated single-token
    constraint must still earn that bit (substates fall back to the full
    row of the state holding their earned bits)."""
    b = FiniteStateMachineBuilder(vocab_size=10)
    nxt, _ = b.build([[[5]], [[3, 4]]])    # c0='dog'(5), c1='fire truck'
    assert _run(nxt, [3, 5]) == 1          # chain broken by 'dog' -> bit0
    assert _run(nxt, [3, 5, 3, 4]) == 3    # then completing the chain


def test_adjacency_no_edge_self_loops():
    """A (state, token) column with no outgoing edge must self-loop, not
    teleport to state 0 (argmax of all-False)."""
    adj = np.zeros((2, 2, 4), bool)
    adj[0, 0, :] = True
    nxt = adjacency_to_next_state(adj)
    assert nxt[1, 0] == 1 and nxt[1, 3] == 1


def test_num_constraints_satisfied_substates_count_zero():
    # substate index (>= 2^C) -> conservative 0, not popcount of the index
    assert list(num_constraints_satisfied(np.array([4, 5]), 2)) == [0, 0]


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

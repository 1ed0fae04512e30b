"""Loss parity tests.

Each reference loss formula (documented in SURVEY.md S2.1 / ops docstrings)
is re-implemented here in torch as an independent oracle, and our JAX ops are
checked against it on random inputs, plus hand-computed micro cases.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp
import jax

from aladin_tpu.ops import losses
from aladin_tpu.ops.alignment import AGGREGATIONS, alignment_scores, score_all_pairs
from aladin_tpu.ops.similarity import cosine_sim, dot_sim, order_sim


# ----------------------------- torch oracles ------------------------------

def torch_hinge(scores: torch.Tensor, margin: float, max_violation: bool):
    diag = scores.diag().view(-1, 1)
    cost_s = (margin + scores - diag).clamp(min=0)
    cost_im = (margin + scores - diag.t()).clamp(min=0)
    eye = torch.eye(scores.size(0), dtype=torch.bool)
    cost_s = cost_s.masked_fill(eye, 0)
    cost_im = cost_im.masked_fill(eye, 0)
    if max_violation:
        cost_s = cost_s.max(1)[0]
        cost_im = cost_im.max(0)[0]
    return (cost_s.sum() + cost_im.sum()).item()


def torch_alignment_scores(im_set, s_seq, im_len, s_len, aggregation):
    """Oracle for the alignment score matrix with per-sample dynamic masking,
    static outer shapes (mirrors the documented reference contract)."""
    im_set = F.normalize(im_set, p=2, dim=2)
    s_seq = F.normalize(s_seq, p=2, dim=2)
    im_set = im_set[:, 1:, :]
    s_seq = s_seq[:, 1:-2, :]
    im_len = [l - 1 for l in im_len]
    s_len = [l - 3 for l in s_len]
    bi, r = im_set.shape[0], im_set.shape[1]
    bc, w = s_seq.shape[0], s_seq.shape[1]
    al = torch.einsum("brd,cwd->bcrw", im_set, s_seq)
    im_pad = torch.zeros(bi, r, dtype=torch.bool)
    for i, l in enumerate(im_len):
        im_pad[i, l:] = True
    s_pad = torch.zeros(bc, w, dtype=torch.bool)
    for i, l in enumerate(s_len):
        s_pad[i, l:] = True
    mask = im_pad[:, None, :, None] | s_pad[None, :, None, :]
    al = al.masked_fill(mask, 0.0)
    if aggregation == "sum":
        return al.sum(dim=(2, 3))
    if aggregation == "mean":
        return al.mean(dim=(2, 3))
    if aggregation == "MrSw":
        return al.max(2)[0].sum(2)
    if aggregation == "MrAVGw":
        return al.max(2)[0].sum(2) / torch.tensor(s_len, dtype=torch.float32)[None, :]
    if aggregation == "symm":
        return al.max(2)[0].sum(2) + al.max(3)[0].sum(2)
    if aggregation == "MwSr":
        return al.max(3)[0].sum(2)
    if aggregation == "scan-sentences":
        na = F.relu(al)
        na = F.normalize(na, p=2, dim=2)
        wts = na.masked_fill(mask, float("-inf"))
        wts = torch.softmax(wts, dim=3)
        wts = torch.nan_to_num(wts, nan=0.0)  # padded-region rows -> 0
        att = torch.einsum("bcrw,cwd->bcrd", wts, s_seq)
        cos = F.cosine_similarity(im_set[:, None, :, :], att, dim=3)
        cos = cos.masked_fill(im_pad[:, None, :], 0.0)
        return cos.sum(2)
    raise AssertionError(aggregation)


# ------------------------------- fixtures ---------------------------------

def make_token_sets(rng, bi=5, bc=7, r=9, w=11, d=16):
    im = rng.randn(bi, r, d).astype(np.float32)
    s = rng.randn(bc, w, d).astype(np.float32)
    im_len = rng.randint(3, r + 1, size=bi).astype(np.int32)
    s_len = rng.randint(4, w + 1, size=bc).astype(np.int32)
    return im, s, im_len, s_len


# --------------------------------- tests ----------------------------------

def test_similarities_against_torch(rng):
    im = rng.randn(6, 8).astype(np.float32)
    s = rng.randn(6, 8).astype(np.float32)
    t_im, t_s = torch.tensor(im), torch.tensor(s)
    np.testing.assert_allclose(np.asarray(dot_sim(im, s)), (t_im @ t_s.t()).numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cosine_sim(im, s)),
        (F.normalize(t_im) @ F.normalize(t_s).t()).numpy(),
        rtol=1e-5,
    )
    ymx = (t_s.unsqueeze(1) - t_im.unsqueeze(0)).clamp(min=0)
    expected_order = -ymx.pow(2).sum(2).sqrt().t()
    np.testing.assert_allclose(
        np.asarray(order_sim(im, s)), expected_order.numpy(), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("max_violation", [False, True])
def test_contrastive_hinge(rng, max_violation):
    scores = rng.randn(8, 8).astype(np.float32)
    ours = float(losses.contrastive_hinge(jnp.array(scores), 0.2, max_violation))
    ref = torch_hinge(torch.tensor(scores), 0.2, max_violation)
    assert abs(ours - ref) < 1e-4


def test_contrastive_hinge_hand_case():
    # 2x2: S = [[1.0, 0.5], [0.2, 0.9]], margin 0.1
    # cost_s offdiag: (0,1): .1+.5-1= -.4 ->0 ; (1,0): .1+.2-.9=-.6->0
    # cost_im offdiag: (0,1): .1+.5-.9=-0.3->0 ; (1,0): .1+.2-1.=-0.7->0
    s = jnp.array([[1.0, 0.5], [0.2, 0.9]])
    assert float(losses.contrastive_hinge(s, 0.1, True)) == 0.0
    # margin 0.6 -> cost_s(0,1)=0.1, cost_im(0,1)=0.2; max_violation sums maxima
    got = float(losses.contrastive_hinge(s, 0.6, True))
    assert abs(got - (0.1 + 0.0 + 0.2 + 0.0)) < 1e-6


@pytest.mark.parametrize("aggregation", AGGREGATIONS)
def test_alignment_scores_vs_oracle(rng, aggregation):
    im, s, im_len, s_len = make_token_sets(rng)
    ours = np.asarray(
        alignment_scores(jnp.array(im), jnp.array(s), jnp.array(im_len), jnp.array(s_len), aggregation)
    )
    ref = torch_alignment_scores(
        torch.tensor(im), torch.tensor(s), im_len.tolist(), s_len.tolist(), aggregation
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_score_all_pairs_matches_dense(rng):
    im, s, im_len, s_len = make_token_sets(rng, bi=4, bc=8, r=6, w=9, d=8)
    dense = np.asarray(
        alignment_scores(jnp.array(im), jnp.array(s), jnp.array(im_len), jnp.array(s_len), "MrSw")
    )
    blocked = np.asarray(
        score_all_pairs(
            jnp.array(im), jnp.array(s), jnp.array(im_len), jnp.array(s_len),
            "MrSw", block_caps=4,
        )
    )
    np.testing.assert_allclose(blocked, dense, rtol=1e-5, atol=1e-6)


def test_distillation_listnet_vs_torch(rng):
    t = rng.randn(8, 8).astype(np.float32)
    st = rng.randn(8, 8).astype(np.float32)
    ours = float(losses.distillation_listnet(jnp.array(t), jnp.array(st)))
    tt, ts = torch.tensor(t), torch.tensor(st)
    eps, temp = 1e-10, 6.0
    s_cost = torch.mean(
        -torch.sum(F.softmax(tt, dim=1) * torch.log(F.softmax(ts * temp, dim=1) + eps), dim=1)
    )
    im_cost = torch.mean(
        -torch.sum(F.softmax(tt, dim=0) * torch.log(F.softmax(ts * temp, dim=0) + eps), dim=0)
    )
    assert abs(ours - float(s_cost + im_cost)) < 1e-4


def test_distillation_mse_vs_torch(rng):
    t = rng.randn(6, 6).astype(np.float32)
    st = rng.randn(6, 6).astype(np.float32)
    wb = np.array([0.5, 0.5], np.float32)
    ours = float(losses.distillation_mse(jnp.array(t), jnp.array(st), jnp.array(wb)))
    ref = F.mse_loss(torch.tensor(st) * 0.5 + 0.5, torch.tensor(t)).item()
    assert abs(ours - ref) < 1e-5


def test_distillation_ordinal_vs_torch(rng):
    t = rng.rand(10, 10).astype(np.float32)  # positive so threshold selects many
    st = rng.randn(10, 10).astype(np.float32)
    ours = float(losses.distillation_ordinal(jnp.array(t), jnp.array(st)))

    tt, ts = torch.tensor(t), torch.tensor(st)
    margin, threshold, stride = 0.2, 0.1, 3
    tr, idx = torch.sort(tt, dim=1)
    so = torch.gather(ts, 1, idx)
    diffs = so[:, :-stride] - so[:, stride:]
    valid = tr >= threshold
    rows = F.relu(margin + diffs[valid[:, stride:]]).mean()
    tc, idxc = torch.sort(tt, dim=0)
    soc = torch.gather(ts, 0, idxc)
    diffc = soc[:-stride, :] - soc[stride:, :]
    validc = tc >= threshold
    cols = F.relu(margin + diffc[validc[stride:, :]]).mean()
    assert abs(ours - float(rows + cols)) < 1e-4


def test_distillation_contrastive_vs_torch(rng):
    t = rng.randn(7, 7).astype(np.float32)
    st = rng.randn(7, 7).astype(np.float32)
    ours = float(losses.distillation_contrastive(jnp.array(t), jnp.array(st)))

    tt, ts = torch.tensor(t), torch.tensor(st)
    margin = 0.2
    eye = torch.eye(7, dtype=torch.bool)
    tn = tt.masked_fill(eye, 0)
    diag = ts.diag().view(-1, 1)
    cost_s = (margin + ts - diag).clamp(min=0)
    cost_im = (margin + ts - diag.t()).clamp(min=0)
    ref = (
        cost_s.index_select(1, tn.max(1)[1]).sum() + cost_im.index_select(0, tn.max(0)[1]).sum()
    ).item()
    assert abs(ours - ref) < 1e-3


def test_entropy_uniformity_vs_torch(rng):
    im = rng.randn(6, 8).astype(np.float32)
    cap = rng.randn(6, 8).astype(np.float32)
    im = im / np.linalg.norm(im, axis=1, keepdims=True)
    cap = cap / np.linalg.norm(cap, axis=1, keepdims=True)
    ours = float(losses.entropy_uniformity_loss(jnp.array(im), jnp.array(cap)))

    x = torch.tensor(np.concatenate([im, cap], 0))
    dots = x @ x.t()
    n = x.shape[0]
    dots.view(-1)[:: n + 1] = -1
    nn_idx = dots.max(1)[1]
    dist = torch.pairwise_distance(x, x[nn_idx])
    ref = (-torch.log(n * dist).mean()).item()
    assert abs(ours - ref) < 1e-4


def test_info_nce_symmetry(rng):
    im = rng.randn(5, 8).astype(np.float32)
    s = rng.randn(5, 8).astype(np.float32)
    got = float(losses.info_nce_loss(jnp.array(im), jnp.array(s), jnp.array(0.0)))
    logits = torch.tensor(im) @ torch.tensor(s).t()
    labels = torch.arange(5)
    ref = (F.cross_entropy(logits.t(), labels) + F.cross_entropy(logits, labels)) / 2
    assert abs(got - float(ref)) < 1e-4


def test_perm_inv_matching_vs_torch(rng):
    im = rng.randn(3, 5, 8).astype(np.float32)
    s = rng.randn(3, 6, 8).astype(np.float32)
    ours = float(losses.perm_inv_matching_loss(jnp.array(im), jnp.array(s)))
    ti, ts = torch.tensor(im), torch.tensor(s)
    dist = torch.cdist(ti, ts, p=2)
    row_sum = F.softmin(dist, dim=2).max(dim=2)[0].sum(dim=1)
    col_sum = F.softmin(dist, dim=1).max(dim=1)[0].sum(dim=1)
    ref = (2 * dist.shape[1] - row_sum - col_sum).mean().item()
    assert abs(ours - ref) < 1e-4


def test_attention_distillation_runs(rng):
    bi, bc, r, w, d = 3, 4, 6, 7, 8
    im = rng.randn(bi, r, d).astype(np.float32)
    s = rng.randn(bc, w, d).astype(np.float32)
    im_len = np.array([6, 4, 5], np.int32)
    s_len = np.array([7, 5, 6, 4], np.int32)
    teacher = np.abs(rng.randn(bi, bc, w + 2, r + 2)).astype(np.float32)
    out = losses.attention_distillation_loss(
        jnp.array(im), jnp.array(s), jnp.array(im_len), jnp.array(s_len), jnp.array(teacher)
    )
    assert np.isfinite(float(out))


def test_combine_losses_fixed_and_auto():
    ld = {"alignment": jnp.array(2.0), "distillation": jnp.array(3.0)}
    fixed = losses.combine_losses(ld, {"alignment": 1.0, "distillation": 0.5})
    assert abs(float(fixed) - 3.5) < 1e-6
    auto = losses.combine_losses(
        ld, {}, auto_weights={"alignment": jnp.array(-2.3), "distillation": jnp.array(-2.3)}
    )
    expected = 0.5 * ((2.0 + 3.0) * np.exp(2.3) + 2 * -2.3)
    assert abs(float(auto) - expected) < 1e-4


def test_semantic_contrastive_runs(rng):
    im = rng.randn(6, 8).astype(np.float32)
    s = rng.randn(6, 8).astype(np.float32)
    rel = rng.rand(6, 6).astype(np.float32)
    out = losses.semantic_contrastive_loss(
        jnp.array(im), jnp.array(s), jnp.array(rel), jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(out))

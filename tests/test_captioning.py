"""Captioning subsystem tests: tensorizer layout, label-smoothed loss vs a
torch oracle, the causal-independence property that makes static decode
valid, and greedy/beam decoding."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aladin_tpu.data.tokenizer import BertWordPieceTokenizer
from aladin_tpu.tasks.captioning import (
    BertImageCaptioner,
    CaptionTensorizer,
    _decode_attention_mask,
    beam_search_decode,
    captioning_loss,
    greedy_decode,
    top_k_top_p_filtering,
)
from tests.test_models import small_cfg

VOCAB = {t: i for i, t in enumerate(
    "[PAD] [UNK] [CLS] [SEP] [MASK] a the dog cat runs sleeps photo of".split()
)}


@pytest.fixture
def tok():
    return BertWordPieceTokenizer(VOCAB)


def test_caption_tensorizer_layout(tok, rng):
    tz = CaptionTensorizer(tok, max_img_seq_length=6, max_seq_length=16,
                           max_seq_a_length=8, img_feature_dim=10, is_train=True, seed=1)
    feats = rng.randn(4, 10).astype(np.float32)
    ids, attn, seg, out_feats, mpos, mids = tz.tensorize("the dog runs", "dog cat", feats)
    assert ids.shape == (16,) and attn.shape == (22, 22)
    assert ids[0] == VOCAB["[CLS]"]
    # caption triangle: pos1 cannot see pos2
    assert attn[1, 2] == 0 and attn[2, 1] == 1
    # caption sees labels and regions
    assert attn[1, 8] == 1 and attn[1, 16] == 1
    # labels/regions never see the caption
    assert attn[8, 1] == 0 and attn[16, 1] == 0
    # masked bookkeeping: positions flagged, originals recorded
    assert mpos.sum() >= 1
    midx = np.where(mpos == 1)[0]
    assert all(1 <= i < 5 for i in midx)  # only caption tokens, not CLS
    assert (mids[: len(midx)] != 0).all()
    assert seg[8] == 1  # od labels are segment 1


def test_captioning_loss_vs_torch(rng):
    n, v = 12, 20
    logits = rng.randn(n, v).astype(np.float32)
    targets = rng.randint(1, v, n).astype(np.int64)
    ours = float(captioning_loss(jnp.array(logits), jnp.array(targets), 0.1))

    eps, t_logits, t_tgt = 0.1, torch.tensor(logits), torch.tensor(targets)
    one_hot = torch.zeros_like(t_logits).scatter(1, t_tgt.view(-1, 1), 1)
    one_hot = one_hot * (1 - eps) + (1 - one_hot) * eps / (v - 1)
    log_prb = torch.log_softmax(t_logits, dim=1)
    ref = torch.nn.functional.kl_div(log_prb, one_hot, reduction="none").sum(1).mean()
    assert abs(ours - float(ref)) < 1e-4


def test_captioning_loss_drop_worst(rng):
    n, v = 10, 8
    logits = rng.randn(n, v).astype(np.float32)
    targets = rng.randint(1, v, n).astype(np.int64)
    full = float(captioning_loss(jnp.array(logits), jnp.array(targets), 0.0))
    dropped = float(captioning_loss(jnp.array(logits), jnp.array(targets), 0.0,
                                    drop_worst_ratio=0.2, drop_worst_active=True))
    assert dropped <= full  # worst 20% removed


def make_captioner(rng):
    cfg = small_cfg(vocab_size=len(VOCAB))
    model = BertImageCaptioner(cfg)
    max_seq_a, od_len, img_len = 6, 4, 3
    max_seq = max_seq_a + od_len
    od_ids = jnp.array(rng.randint(5, len(VOCAB), (2, od_len)).astype(np.int32))
    od_seg = jnp.ones((2, od_len), jnp.int32)
    feats = jnp.array(rng.randn(2, img_len, cfg.img_feature_dim).astype(np.float32))
    mask = jnp.array(
        np.broadcast_to(
            _decode_attention_mask(max_seq_a, max_seq, img_len, od_len, img_len),
            (2, max_seq + img_len, max_seq + img_len),
        ).copy()
    )
    ids = jnp.concatenate(
        [jnp.full((2, max_seq_a), VOCAB["[MASK]"], jnp.int32), od_ids], axis=1
    )
    seg = jnp.concatenate([jnp.zeros((2, max_seq_a), jnp.int32), od_seg], axis=1)
    params = model.init(jax.random.PRNGKey(0), ids, mask, seg, feats, True)["params"]
    return model, params, od_ids, od_seg, feats, mask, max_seq_a


def test_decode_causal_independence(rng):
    """Logits at position t must not depend on caption slots > t - the
    property that makes the static-buffer decode equivalent to stepwise
    generation."""
    model, params, od_ids, od_seg, feats, mask, max_seq_a = make_captioner(rng)
    base_cap = np.full((2, max_seq_a), VOCAB["[MASK]"], np.int32)
    base_cap[:, 0] = VOCAB["[CLS]"]
    base_cap[:, 1] = VOCAB["the"]

    def logits_at(cap, t):
        ids = jnp.concatenate([jnp.array(cap), od_ids], axis=1)
        seg = jnp.concatenate([jnp.zeros((2, max_seq_a), jnp.int32), od_seg], axis=1)
        out = model.apply({"params": params}, ids, mask, seg, feats, True)
        return np.asarray(out)[:, t, :]

    t = 2
    l1 = logits_at(base_cap, t)
    scribbled = base_cap.copy()
    scribbled[:, t + 1 :] = VOCAB["dog"]  # change the future
    l2 = logits_at(scribbled, t)
    np.testing.assert_allclose(l1, l2, atol=1e-5)
    # and they DO depend on the past
    past = base_cap.copy()
    past[:, 1] = VOCAB["dog"]
    l3 = logits_at(past, t)
    assert np.abs(l1 - l3).max() > 1e-4


def test_greedy_decode_runs_and_stops(rng):
    model, params, od_ids, od_seg, feats, mask, max_seq_a = make_captioner(rng)
    toks, logp = greedy_decode(
        model, params, od_ids, od_seg, feats, mask,
        max_steps=max_seq_a - 1, cls_id=VOCAB["[CLS]"], sep_id=VOCAB["[SEP]"],
        mask_id=VOCAB["[MASK]"], pad_id=VOCAB["[PAD]"],
    )
    toks = np.asarray(toks)
    assert toks.shape == (2, max_seq_a)
    assert (toks[:, 0] == VOCAB["[CLS]"]).all()
    assert np.isfinite(np.asarray(logp)).all()
    # after a SEP, everything is PAD
    for row in toks:
        sep = np.where(row == VOCAB["[SEP]"])[0]
        if len(sep):
            assert (row[sep[0] + 1 :] == VOCAB["[PAD]"]).all()


def test_beam1_matches_greedy(rng):
    model, params, od_ids, od_seg, feats, mask, max_seq_a = make_captioner(rng)
    kw = dict(max_steps=max_seq_a - 1, cls_id=VOCAB["[CLS]"], sep_id=VOCAB["[SEP]"],
              mask_id=VOCAB["[MASK]"], pad_id=VOCAB["[PAD]"])
    g_toks, _ = greedy_decode(model, params, od_ids, od_seg, feats, mask, **kw)
    b_toks, _ = beam_search_decode(model, params, od_ids, od_seg, feats, mask,
                                   num_beams=1, **kw)
    np.testing.assert_array_equal(np.asarray(g_toks), np.asarray(b_toks))


def test_beam_search_width(rng):
    model, params, od_ids, od_seg, feats, mask, max_seq_a = make_captioner(rng)
    toks, score = beam_search_decode(
        model, params, od_ids, od_seg, feats, mask, num_beams=3,
        max_steps=max_seq_a - 1, cls_id=VOCAB["[CLS]"], sep_id=VOCAB["[SEP]"],
        mask_id=VOCAB["[MASK]"], pad_id=VOCAB["[PAD]"],
    )
    assert np.asarray(toks).shape == (2, max_seq_a)
    assert np.isfinite(np.asarray(score)).all()


def test_top_k_top_p_filtering(rng):
    logits = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    k2 = np.asarray(top_k_top_p_filtering(logits, top_k=2))
    assert (k2[0, :2] <= -1e8).all() and k2[0, 3] == 4.0
    p = np.asarray(top_k_top_p_filtering(logits, top_p=0.5))
    assert p[0, 3] == 4.0 and (p[0, :2] <= -1e8).all()

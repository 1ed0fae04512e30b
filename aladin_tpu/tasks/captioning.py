"""Image captioning: masked-LM training + static-shape decode.

Behavioral contract (ref:oscar/modeling/modeling_bert.py:604-911
BertForImageCaptioning, ref:oscar/run_captioning.py:195-325
CaptionTensorizer):

  * layout: [caption slots (max_seq_a), OD-label tokens (to max_seq), image
    regions (max_img_seq)]; 2-D attention mask - caption->caption lower
    triangle, caption->labels/regions full, labels/regions attend among
    themselves but NEVER to the caption (ref:run_captioning.py:297-317);
  * training: mask round(0.15 * len) of the caption tokens (<= 3), 80%
    [MASK] / 10% random / 10% keep; loss = label-smoothed KL over masked
    positions with optional drop-worst (ref:modeling_bert.py:575-601);
  * MLM head: transform (dense + gelu + LN) -> decoder tied to the word
    embeddings + bias (tie_weights, ref:modeling_bert.py:618-621);
  * decoding is masked-LM style: position t holds [MASK]; its logits emit
    token t.

TPU-first redesign of generation: the reference mutates a KV cache with
dynamic shapes per step (ref:modeling_bert.py:659-755). At caption lengths
<= 40 over a <= 120-token context, recomputing the full static forward per
step is cheaper than cache surgery on TPU and keeps every shape static: the
caption buffer is pre-filled with [MASK]; the causal triangle makes logits
at position t depend only on tokens < t, so one jitted step function serves
the whole lax.scan. Greedy and fixed-width beam search are provided; CBS
grafts onto the beam step via an FSM state (tasks/cbs.py).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from aladin_tpu.models.bert_img import BertImgConfig, BertImgModel, _dense_init, _ffn_act


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

class BertMLMHead(nn.Module):
    """BertOnlyMLMHead: dense + gelu + LN, then a decoder tied to the word
    embeddings plus a free bias."""

    cfg: BertImgConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, word_embeddings: Array) -> Array:
        cfg = self.cfg
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=_dense_init(cfg),
                     name="transform_dense")(x)
        x = _ffn_act(x, cfg.hidden_act)  # follows the backbone's variant
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="transform_layernorm")(x)
        logits = jnp.einsum(
            "...d,vd->...v", x, word_embeddings.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        bias = self.param("decoder_bias", nn.initializers.zeros, (cfg.vocab_size,))
        return logits + bias


class BertImageCaptioner(nn.Module):
    """Backbone + tied MLM head over the caption positions."""

    cfg: BertImgConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids, img_feats,
                 deterministic: bool = True) -> Array:
        """Returns (B, L_text, vocab) logits over ALL text positions."""
        backbone = BertImgModel(self.cfg, self.dtype, name="bert")
        seq, _, _, _ = backbone(
            input_ids, attention_mask, token_type_ids, img_feats, deterministic
        )
        text_len = input_ids.shape[1]
        word_emb = self.variables["params"]["bert"]["word_embeddings"]["embedding"]
        return BertMLMHead(self.cfg, self.dtype, name="cls")(seq[:, :text_len], word_emb)


# ---------------------------------------------------------------------------
# Loss (ref:modeling_bert.py:575-601)
# ---------------------------------------------------------------------------

def captioning_loss(
    logits: Array,  # (N, vocab) gathered masked-position logits
    targets: Array,  # (N,) int ids; 0 ([PAD]) = inactive slot
    label_smoothing: float = 0.1,
    drop_worst_ratio: float = 0.0,
    drop_worst_active: bool = False,
) -> Array:
    n_class = logits.shape[-1]
    eps = label_smoothing
    one_hot = jax.nn.one_hot(targets, n_class)
    soft = one_hot * (1 - eps) + (1 - one_hot) * eps / (n_class - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # KLDiv(log_prb, one_hot).sum(1): sum q*(log q - log p); torch's kl_div
    # contributes q*log q only where q > 0.
    q_logq = jnp.where(soft > 0, soft * jnp.log(jnp.maximum(soft, 1e-38)), 0.0)
    per_tok = jnp.sum(q_logq - soft * logp, axis=-1)
    active = targets != 0  # padding masks removed (ref:modeling_bert.py:648)
    per_tok = jnp.where(active, per_tok, jnp.inf)  # inf sorts worst; masked below

    if drop_worst_ratio > 0:
        # the reference's k is int(ACTIVE_count * (1-ratio)) — its loss
        # vector holds only the dynamically-gathered masked tokens
        # (ref:modeling_bert.py:595-597). The active count is traced here,
        # so sort ascending (inactive inf sorts last) and keep the first
        # floor(a * (1-ratio)) entries by mask instead of a static top_k.
        sorted_loss = jnp.sort(per_tok)
        a = jnp.sum(active)
        keep = jnp.floor(
            a.astype(jnp.float32) * (1.0 - drop_worst_ratio)
        ).astype(jnp.int32)
        keep = jnp.maximum(keep, 1)
        sel = jnp.arange(per_tok.shape[0]) < keep

        def dropped():
            vals = jnp.where(sel & jnp.isfinite(sorted_loss), sorted_loss, 0.0)
            return jnp.sum(vals) / jnp.maximum(keep, 1)

        def plain():
            vals = jnp.where(active, jnp.where(jnp.isfinite(per_tok), per_tok, 0.0), 0.0)
            return jnp.sum(vals) / jnp.maximum(jnp.sum(active), 1)

        return jax.lax.cond(jnp.asarray(drop_worst_active), dropped, plain)
    vals = jnp.where(active, jnp.where(jnp.isfinite(per_tok), per_tok, 0.0), 0.0)
    return jnp.sum(vals) / jnp.maximum(jnp.sum(active), 1)


# ---------------------------------------------------------------------------
# Tensorizer (ref:run_captioning.py:195-325)
# ---------------------------------------------------------------------------

class CaptionTensorizer:
    def __init__(self, tokenizer, max_img_seq_length=50, max_seq_length=70,
                 max_seq_a_length=40, mask_prob=0.15, max_masked_tokens=3,
                 img_feature_dim=2054, is_train=True, seed=0):
        self.tok = tokenizer
        self.max_img_seq_len = max_img_seq_length
        self.max_seq_len = max_seq_length
        self.max_seq_a_len = max_seq_a_length
        self.mask_prob = mask_prob
        self.max_masked = max_masked_tokens
        self.img_feature_dim = img_feature_dim
        self.is_train = is_train
        self.rng = np.random.RandomState(seed)
        ids = tokenizer.convert_tokens_to_ids(
            [tokenizer.pad_token, tokenizer.mask_token, tokenizer.cls_token,
             tokenizer.sep_token])
        self.pad_id, self.mask_id, self.cls_id, self.sep_id = ids

    def _encode_trunc(self, text: str, max_tokens: int):
        """tokenize -> truncate -> ids (data/tokenizer.py
        encode_trunc_any: C++ fast path or generic fallback)."""
        from aladin_tpu.data.tokenizer import encode_trunc_any

        return encode_trunc_any(self.tok, text, max_tokens)

    def attention_mask(self, seq_a_len: int, seq_len: int, img_len: int) -> np.ndarray:
        """(L_total, L_total) 2-D mask, reference block layout."""
        la, lt, li = self.max_seq_a_len, self.max_seq_len, self.max_img_seq_len
        m = np.zeros((lt + li, lt + li), np.int32)
        tri = np.tril(np.ones((seq_a_len, seq_a_len), np.int32))
        m[:seq_a_len, :seq_a_len] = tri
        m[la:seq_len, la:seq_len] = 1  # L-L
        m[lt : lt + img_len, lt : lt + img_len] = 1  # R-R
        m[:seq_a_len, la:seq_len] = 1  # C->L
        m[:seq_a_len, lt : lt + img_len] = 1  # C->R
        m[la:seq_len, lt : lt + img_len] = 1  # L->R
        m[lt : lt + img_len, la:seq_len] = 1  # R->L
        return m

    def tensorize(self, caption: Optional[str], od_labels: Optional[str], feats: np.ndarray):
        if self.is_train:
            body_a = self._encode_trunc(caption, self.max_seq_a_len - 2)
        else:
            body_a = [self.mask_id] * (self.max_seq_a_len - 2)
        ids_list = [self.cls_id] + body_a + [self.sep_id]
        seg = [0] * len(ids_list)
        seq_a_len = len(ids_list)
        if od_labels:
            ids_list += [self.pad_id] * (self.max_seq_a_len - seq_a_len)
            seg += [0] * (self.max_seq_a_len - len(seg))
            room = self.max_seq_len - len(ids_list) - 1
            if room > 0:  # room<=0: even a bare [SEP] would overflow
                body_b = self._encode_trunc(od_labels, room)
                ids_list += body_b + [self.sep_id]
                seg += [1] * (len(body_b) + 1)
        seq_len = len(ids_list)

        masked_pos = np.zeros(self.max_seq_len, np.int32)
        masked_ids = np.zeros(self.max_masked, np.int64)
        if self.is_train:
            # id-level masking: vocab ids are line indices, so the
            # reference's random token draw (list(vocab)[randint]) is the
            # same distribution as a random id (ref:run_captioning.py:262-278)
            cand = list(range(1, seq_a_len))
            self.rng.shuffle(cand)
            num = int(min(max(round(self.mask_prob * seq_a_len), 1), self.max_masked))
            idx = sorted(cand[:num])
            originals = [ids_list[i] for i in idx]
            for pos in idx:
                r = self.rng.rand()
                if r <= 0.8:
                    ids_list[pos] = self.mask_id
                elif self.rng.rand() <= 0.5:
                    ids_list[pos] = int(self.rng.randint(len(self.tok.vocab)))
            masked_pos[idx] = 1
            masked_ids[: len(originals)] = originals
        else:
            masked_pos[:] = 1

        ids_list += [self.pad_id] * (self.max_seq_len - seq_len)
        seg += [0] * (self.max_seq_len - len(seg))
        input_ids = np.asarray(ids_list, np.int32)

        img_len = min(feats.shape[0], self.max_img_seq_len)
        out_feats = np.zeros((self.max_img_seq_len, self.img_feature_dim), np.float32)
        out_feats[:img_len] = feats[:img_len, : self.img_feature_dim]
        attn = self.attention_mask(seq_a_len, seq_len, img_len)
        return input_ids, attn, np.asarray(seg, np.int32), out_feats, masked_pos, masked_ids


# ---------------------------------------------------------------------------
# Decoding (static shapes; see module docstring)
# ---------------------------------------------------------------------------

def _decode_attention_mask(max_seq_a, max_seq, max_img, od_len, img_len, dtype=np.int32):
    """Static decode mask: full triangle over caption slots."""
    m = np.zeros((max_seq + max_img, max_seq + max_img), dtype)
    m[:max_seq_a, :max_seq_a] = np.tril(np.ones((max_seq_a, max_seq_a), dtype))
    l0, l1 = max_seq_a, max_seq_a + od_len
    r0, r1 = max_seq, max_seq + img_len
    m[l0:l1, l0:l1] = 1
    m[r0:r1, r0:r1] = 1
    m[:max_seq_a, l0:l1] = 1
    m[:max_seq_a, r0:r1] = 1
    m[l0:l1, r0:r1] = 1
    m[r0:r1, l0:l1] = 1
    return m


@functools.partial(
    jax.jit, static_argnames=("model", "max_steps", "cls_id", "sep_id", "mask_id", "pad_id")
)
def greedy_decode(
    model: BertImageCaptioner,
    params,
    od_ids: Array,  # (B, max_seq - max_seq_a) padded od-label tokens
    od_seg: Array,
    img_feats: Array,  # (B, R, F)
    attn_mask: Array,  # (B, L, L) static decode mask
    *,
    max_steps: int,
    cls_id: int,
    sep_id: int,
    mask_id: int,
    pad_id: int,
) -> Tuple[Array, Array]:
    """Greedy masked-LM decode. Returns (tokens (B, max_steps+1), logprobs)."""
    b = img_feats.shape[0]
    max_seq_a = max_steps + 1

    cap = jnp.full((b, max_seq_a), mask_id, jnp.int32).at[:, 0].set(cls_id)
    seg_a = jnp.zeros((b, max_seq_a), jnp.int32)

    def step(carry, t):
        cap, finished, logprob = carry
        ids = jnp.concatenate([cap, od_ids], axis=1)
        seg = jnp.concatenate([seg_a, od_seg], axis=1)
        logits = model.apply({"params": params}, ids, attn_mask, seg, img_feats, True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        step_logp = jnp.take_along_axis(
            logp, jnp.full((b, 1, 1), 0, jnp.int32) + t[None, None, None], axis=1
        )[:, 0, :]  # (B, vocab) logits at position t
        tok = jnp.argmax(step_logp, axis=-1).astype(jnp.int32)
        tok_lp = jnp.take_along_axis(step_logp, tok[:, None], axis=1)[:, 0]
        tok = jnp.where(finished, pad_id, tok)
        tok_lp = jnp.where(finished, 0.0, tok_lp)
        # write unconditionally: tok is already PAD for finished rows
        cap = jnp.where(jnp.arange(max_seq_a)[None, :] == t, tok[:, None], cap)
        finished = finished | (tok == sep_id)
        return (cap, finished, logprob + tok_lp), None

    init = (cap, jnp.zeros((b,), bool), jnp.zeros((b,), jnp.float32))
    (cap, finished, logprob), _ = jax.lax.scan(
        step, init, jnp.arange(1, max_seq_a, dtype=jnp.int32)
    )
    return cap, logprob


@functools.partial(
    jax.jit,
    static_argnames=("model", "max_steps", "num_beams", "cls_id", "sep_id", "mask_id",
                     "pad_id", "length_penalty"),
)
def beam_search_decode(
    model: BertImageCaptioner,
    params,
    od_ids: Array,
    od_seg: Array,
    img_feats: Array,
    attn_mask: Array,
    *,
    max_steps: int,
    num_beams: int = 5,
    cls_id: int,
    sep_id: int,
    mask_id: int,
    pad_id: int,
    length_penalty: float = 1.0,
) -> Tuple[Array, Array]:
    """Fixed-width beam search (beams folded into batch). Returns the best
    (tokens (B, max_steps+1), score) per example - the capability of the
    reference's _generate_beam_search (ref:oscar/modeling/modeling_utils.py)
    with static shapes."""
    b = img_feats.shape[0]
    k = num_beams
    max_seq_a = max_steps + 1

    tile = lambda x: jnp.repeat(x, k, axis=0)  # noqa: E731
    od_ids_t, od_seg_t = tile(od_ids), tile(od_seg)
    img_t, attn_t = tile(img_feats), tile(attn_mask)
    seg_a = jnp.zeros((b * k, max_seq_a), jnp.int32)

    cap = jnp.full((b * k, max_seq_a), mask_id, jnp.int32).at[:, 0].set(cls_id)
    # beam 0 active, others -inf so the first expansion seeds distinct tokens
    scores = jnp.tile(jnp.array([0.0] + [-1e9] * (k - 1), jnp.float32), (b,))
    finished = jnp.zeros((b * k,), bool)
    lengths = jnp.ones((b * k,), jnp.int32)

    def step(carry, t):
        cap, scores, finished, lengths = carry
        ids = jnp.concatenate([cap, od_ids_t], axis=1)
        seg = jnp.concatenate([seg_a, od_seg_t], axis=1)
        logits = model.apply({"params": params}, ids, attn_t, seg, img_t, True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        step_logp = jnp.take_along_axis(
            logp, jnp.full((b * k, 1, 1), t, jnp.int32), axis=1
        )[:, 0, :]  # (B*K, V)
        v = step_logp.shape[-1]
        # finished beams only extend with pad at no cost
        pad_row = jnp.full((v,), -1e9).at[pad_id].set(0.0)
        step_logp = jnp.where(finished[:, None], pad_row[None, :], step_logp)

        cand = scores[:, None] + step_logp  # (B*K, V)
        cand = cand.reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(cand, k)  # (B, K)
        beam_idx = top_idx // v + jnp.arange(b)[:, None] * k  # source beam
        tok = (top_idx % v).astype(jnp.int32)

        cap = cap[beam_idx.reshape(-1)]
        finished = finished[beam_idx.reshape(-1)]
        lengths = lengths[beam_idx.reshape(-1)]
        tok = tok.reshape(-1)
        write_tok = jnp.where(finished, pad_id, tok)
        cap = jnp.where(jnp.arange(max_seq_a)[None, :] == t, write_tok[:, None], cap)
        lengths = jnp.where(finished, lengths, lengths + 1)
        finished = finished | (tok == sep_id)
        return (cap, top_scores.reshape(-1), finished, lengths), None

    (cap, scores, finished, lengths), _ = jax.lax.scan(
        step, (cap, scores, finished, lengths),
        jnp.arange(1, max_seq_a, dtype=jnp.int32),
    )
    norm = scores / jnp.power(lengths.astype(jnp.float32), length_penalty)
    norm = norm.reshape(b, k)
    best = jnp.argmax(norm, axis=1)
    cap = cap.reshape(b, k, max_seq_a)[jnp.arange(b), best]
    return cap, norm[jnp.arange(b), best]


@functools.partial(
    jax.jit,
    static_argnames=("model", "max_steps", "cls_id", "sep_id", "mask_id", "pad_id",
                     "top_k", "top_p", "temperature"),
)
def sample_decode(
    model: BertImageCaptioner,
    params,
    od_ids: Array,
    od_seg: Array,
    img_feats: Array,
    attn_mask: Array,
    rng: Array,
    *,
    max_steps: int,
    cls_id: int,
    sep_id: int,
    mask_id: int,
    pad_id: int,
    top_k: int = 0,
    top_p: float = 1.0,
    temperature: float = 1.0,
) -> Array:
    """Stochastic masked-LM decode (the SCST sampling pass,
    ref:oscar/run_captioning.py:522-580 capability): like greedy_decode but
    each step draws from the (top-k/top-p filtered) softmax. Returns token
    rows (B, max_steps+1); logprobs for the policy gradient come from
    token_logprobs (the differentiable evaluation pass)."""
    b = img_feats.shape[0]
    max_seq_a = max_steps + 1
    cap = jnp.full((b, max_seq_a), mask_id, jnp.int32).at[:, 0].set(cls_id)
    seg_a = jnp.zeros((b, max_seq_a), jnp.int32)

    def step(carry, t):
        cap, finished, key = carry
        ids = jnp.concatenate([cap, od_ids], axis=1)
        seg = jnp.concatenate([seg_a, od_seg], axis=1)
        logits = model.apply({"params": params}, ids, attn_mask, seg, img_feats, True)
        step_logits = jnp.take_along_axis(
            logits, jnp.full((b, 1, 1), t, jnp.int32), axis=1
        )[:, 0, :] / temperature
        step_logits = top_k_top_p_filtering(step_logits, top_k, top_p)
        key, sub = jax.random.split(key)
        tok = jax.random.categorical(sub, step_logits, axis=-1).astype(jnp.int32)
        tok = jnp.where(finished, pad_id, tok)
        cap = jnp.where(jnp.arange(max_seq_a)[None, :] == t, tok[:, None], cap)
        finished = finished | (tok == sep_id)
        return (cap, finished, key), None

    init = (cap, jnp.zeros((b,), bool), rng)
    (cap, _, _), _ = jax.lax.scan(step, init, jnp.arange(1, max_seq_a, dtype=jnp.int32))
    return cap


def token_logprobs(
    model: BertImageCaptioner,
    params,
    tokens: Array,  # (B, max_seq_a) decoded rows (CLS first)
    od_ids: Array,
    od_seg: Array,
    img_feats: Array,
    attn_mask: Array,
    *,
    mask_id: int,
    pad_id: int,
) -> Tuple[Array, Array]:
    """Differentiable per-token logprobs of a decoded caption under the SAME
    conditioning the decoder used: logp at position t is evaluated with
    positions >= t re-masked (prefix teacher-forcing), one checkpointed
    forward per step. Returns (logprobs (B, T), mask (B, T)) over positions
    1..max_seq_a-1; padding tokens are masked out. This is the gradient path
    of SCST: loss = -advantage * sum(logprobs * mask)."""
    b, max_seq_a = tokens.shape
    seg_a = jnp.zeros((b, max_seq_a), jnp.int32)
    pos = jnp.arange(max_seq_a)[None, :]

    @jax.checkpoint
    def logp_at(p, t):
        cap = jnp.where(pos < t, tokens, mask_id)
        ids = jnp.concatenate([cap, od_ids], axis=1)
        seg = jnp.concatenate([seg_a, od_seg], axis=1)
        logits = model.apply({"params": p}, ids, attn_mask, seg, img_feats, True)
        step_logp = jax.nn.log_softmax(
            jnp.take_along_axis(logits, jnp.full((b, 1, 1), t, jnp.int32), axis=1)[:, 0, :],
            axis=-1,
        )
        tok = jnp.take_along_axis(tokens, jnp.full((b, 1), t, jnp.int32), axis=1)[:, 0]
        return jnp.take_along_axis(step_logp, tok[:, None], axis=1)[:, 0]

    def body(_, t):
        return None, logp_at(params, t)

    ts = jnp.arange(1, max_seq_a, dtype=jnp.int32)
    _, lps = jax.lax.scan(body, None, ts)  # (T, B)
    lps = lps.T  # (B, T)
    mask = (tokens[:, 1:] != pad_id).astype(lps.dtype)
    return lps, mask


def top_k_top_p_filtering(logits: Array, top_k: int = 0, top_p: float = 1.0,
                          filter_value: float = -1e9) -> Array:
    """Sampling filter (ref:oscar/modeling/modeling_utils.py:600-633
    capability) - static-shape version."""
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, filter_value, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, filter_value, logits)
    return logits

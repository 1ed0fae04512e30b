"""Backbone & head parity tests against torch oracles.

The OSCAR backbone must match standard (post-LN, erf-gelu) BERT semantics
exactly; we verify by loading identical weights into HuggingFace's BertModel
(text path) and a small torch oracle combining HF embeddings with the
documented image-feature path (projection + LN + concat + extended mask).
The torch-TE heads are checked against torch.nn.TransformerEncoder directly.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aladin_tpu.config import ExperimentConfig
from aladin_tpu.io.convert import convert_bert_state, convert_torch_te_state
from aladin_tpu.models.aladin import ALADIN, Batch
from aladin_tpu.models.bert_img import BertImgConfig, BertImgModel
from aladin_tpu.models.layers import TorchTransformerEncoder

SMALL = dict(
    vocab_size=97,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    img_feature_dim=20,
)


def small_cfg(**kw):
    d = dict(SMALL)
    d.update(kw)
    return BertImgConfig(**d)


def hf_bert(cfg: BertImgConfig):
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu",
        layer_norm_eps=cfg.layer_norm_eps,
        attn_implementation="eager",
    )
    m = BertModel(hf_cfg)
    m.eval()
    return m


def flax_params_from_hf(hf_model, img_linear=None, img_ln=None):
    tree = {}
    convert_bert_state(
        {k: v for k, v in hf_model.state_dict().items()}, tree, out_prefix=""
    )
    if img_linear is not None:
        tree["img_embedding"] = {
            "kernel": img_linear.weight.detach().numpy().T,
            "bias": img_linear.bias.detach().numpy(),
        }
    if img_ln is not None:
        tree["img_layernorm"] = {
            "scale": img_ln.weight.detach().numpy(),
            "bias": img_ln.bias.detach().numpy(),
        }
    return {"params": tree}


def test_text_path_matches_hf(rng):
    torch.manual_seed(0)
    cfg = small_cfg()
    hf = hf_bert(cfg)
    model = BertImgModel(cfg)

    b, l = 3, 12
    ids = rng.randint(3, cfg.vocab_size, size=(b, l)).astype(np.int32)
    lens = np.array([12, 7, 9])
    mask = (np.arange(l)[None, :] < lens[:, None]).astype(np.int32)
    tt = np.zeros((b, l), np.int32)

    params = flax_params_from_hf(hf)
    seq, pooled, hidden, _ = model.apply(
        params, jnp.array(ids), jnp.array(mask), jnp.array(tt), None, True,
        output_hidden_states=True,
    )
    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
        )
    np.testing.assert_allclose(np.asarray(seq), out.last_hidden_state.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5)
    assert hidden.shape == (cfg.num_hidden_layers + 1, b, l, cfg.hidden_size)


def test_image_path_matches_oracle(rng):
    """Oracle: HF embeddings for text, manual Linear+LN for regions, concat,
    HF encoder with the -10000 extended mask (the documented BertImgModel
    contract, ref:oscar/modeling/modeling_bert.py:199-279)."""
    torch.manual_seed(1)
    cfg = small_cfg()
    hf = hf_bert(cfg)
    img_linear = torch.nn.Linear(cfg.img_feature_dim, cfg.hidden_size)
    img_ln = torch.nn.LayerNorm(cfg.hidden_size, eps=cfg.img_layer_norm_eps)
    model = BertImgModel(cfg)

    b, l, r = 2, 10, 6
    ids = rng.randint(3, cfg.vocab_size, size=(b, l)).astype(np.int32)
    feats = rng.randn(b, r, cfg.img_feature_dim).astype(np.float32)
    txt_len = np.array([10, 6])
    img_len = np.array([6, 4])
    mask = np.concatenate(
        [
            (np.arange(l)[None] < txt_len[:, None]).astype(np.int32),
            (np.arange(r)[None] < img_len[:, None]).astype(np.int32),
        ],
        axis=1,
    )
    tt = np.zeros((b, l), np.int32)

    params = flax_params_from_hf(hf, img_linear, img_ln)
    seq, _, _, _ = model.apply(
        params, jnp.array(ids), jnp.array(mask), jnp.array(tt), jnp.array(feats), True
    )

    with torch.no_grad():
        emb = hf.embeddings(
            input_ids=torch.tensor(ids, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
        )
        img_e = img_ln(img_linear(torch.tensor(feats)))
        x = torch.cat([emb, img_e], dim=1)
        ext = (1.0 - torch.tensor(mask, dtype=torch.float32))[:, None, None, :] * -10000.0
        out = hf.encoder(x, attention_mask=ext).last_hidden_state
    np.testing.assert_allclose(np.asarray(seq), out.numpy(), atol=2e-5)


def test_torch_te_parity(rng):
    torch.manual_seed(2)
    d, heads, layers = 32, 4, 2
    torch_te = torch.nn.TransformerEncoder(
        torch.nn.TransformerEncoderLayer(d_model=d, nhead=heads, dim_feedforward=d, dropout=0.1),
        num_layers=layers,
    )
    torch_te.eval()

    ours = TorchTransformerEncoder(layers, d, nhead=heads, dim_feedforward=d, dropout=0.1)
    tree = {}
    convert_torch_te_state({k: v for k, v in torch_te.state_dict().items()}, tree, "te")
    params = {"params": tree["te"]}

    b, s = 3, 9
    x = rng.randn(b, s, d).astype(np.float32)
    lens = np.array([9, 5, 7])
    pad = np.arange(s)[None] >= lens[:, None]

    got = ours.apply(params, jnp.array(x), jnp.array(pad), True)
    with torch.no_grad():
        # torch TE (pre-batch_first era) wants (S, B, E)
        ref = torch_te(
            torch.tensor(x).permute(1, 0, 2), src_key_padding_mask=torch.tensor(pad)
        ).permute(1, 0, 2)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def make_batch(rng, b=4, l=16, r=6, img_dim=20, vocab=97):
    cap_len = rng.randint(5, l + 1, size=b).astype(np.int32)
    img_len = rng.randint(2, r + 1, size=b).astype(np.int32)
    txt_mask = (np.arange(l)[None] < cap_len[:, None]).astype(np.int32)
    img_mask = np.concatenate(
        [
            (np.arange(l)[None] < 5).astype(np.int32) * np.ones((b, 1), np.int32),
            (np.arange(r)[None] < img_len[:, None]).astype(np.int32),
        ],
        axis=1,
    )
    return Batch(
        txt_ids=jnp.array(rng.randint(3, vocab, size=(b, l)).astype(np.int32)),
        txt_mask=jnp.array(txt_mask),
        txt_type=jnp.zeros((b, l), jnp.int32),
        cap_len=jnp.array(cap_len),
        img_ids=jnp.array(rng.randint(3, vocab, size=(b, l)).astype(np.int32)),
        img_mask=jnp.array(img_mask),
        img_type=jnp.ones((b, l), jnp.int32),
        img_feats=jnp.array(rng.randn(b, r, img_dim).astype(np.float32)),
        img_len=jnp.array(img_len),
    )


def aladin_small(loss_type="alignment-distillation", **model_over):
    d = {
        "model": {
            "embed-size": SMALL["hidden_size"],
            "tern-layers": 2,
            "teran-layers": 0,
            **model_over,
        },
        "training": {"loss-type": loss_type, "loss-weights": [1, 1]},
    }
    cfg = ExperimentConfig.from_dict(d)
    return ALADIN(cfg, small_cfg())


def test_aladin_forward_shapes(rng):
    model = aladin_small()
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch, True)
    out = model.apply(params, batch, True)
    b, l, r, d = 4, 16, 6, SMALL["hidden_size"]
    assert out.img_global.shape == (b, d)
    assert out.cap_global.shape == (b, d)
    assert out.img_set.shape == (b, r, d)
    assert out.cap_seq.shape == (b, l, d)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out.img_global), axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.cap_seq), axis=2), 1.0, rtol=1e-5
    )  # every token l2-normalized


def test_aladin_padding_invariance(rng):
    """Real-token outputs must not depend on padded content."""
    model = aladin_small()
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch, True)
    out1 = model.apply(params, batch, True)

    # scribble over padded text tokens and padded region features
    l, r = 16, 6
    txt_pad = np.arange(l)[None] >= np.asarray(batch.cap_len)[:, None]
    img_pad = np.arange(r)[None] >= np.asarray(batch.img_len)[:, None]
    ids2 = np.where(txt_pad, 7, np.asarray(batch.txt_ids))
    feats2 = np.where(img_pad[..., None], 3.14, np.asarray(batch.img_feats))
    batch2 = batch.replace(txt_ids=jnp.array(ids2), img_feats=jnp.array(feats2.astype(np.float32)))
    out2 = model.apply(params, batch2, True)

    np.testing.assert_allclose(np.asarray(out1.img_global), np.asarray(out2.img_global), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1.cap_global), np.asarray(out2.cap_global), atol=1e-5)
    # valid set positions also invariant
    valid_img = ~img_pad
    np.testing.assert_allclose(
        np.asarray(out1.img_set)[valid_img], np.asarray(out2.img_set)[valid_img], atol=1e-5
    )


@pytest.mark.parametrize(
    "over",
    [
        {"teran-layers": 1, "shared-transformer": True},
        {"teran-layers": 1, "shared-transformer": False},
        {"depth-aggregation-matching": "mean"},
        {"depth-aggregation-matching": "gated"},
        {"depth-aggregation-alignment": "mean"},
        {"depth-aggregation-matching": "mean", "post-layers": 1},
        {"depth-aggregation-matching": "transformer"},
    ],
)
def test_aladin_variants_run(rng, over):
    model = aladin_small(**over)
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch, True)
    out = model.apply(params, batch, True)
    assert np.isfinite(np.asarray(out.img_global)).all()
    assert np.isfinite(np.asarray(out.cap_global)).all()


def test_hidden_act_gelu_tanh_variant(rng):
    """hidden_act='gelu_tanh' (the TPU-fast tanh approximation; chip-measured
    ~10-15% step-time win over exact erf at B=128) must run end-to-end and stay
    CLOSE to the exact-erf forward (max |gelu_tanh - gelu| ~ 1e-3 per
    activation) while not being identical — guards both the plumbing and
    against the knob silently mapping to the same function."""
    import jax

    ids = jnp.asarray(rng.randint(0, 97, size=(2, 10)), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    outs = {}
    for act in ("gelu", "gelu_tanh"):
        model = BertImgModel(small_cfg(hidden_act=act))
        params = model.init(jax.random.PRNGKey(0), ids, mask)
        seq, pooled, _, _ = model.apply(params, ids, mask)
        outs[act] = np.asarray(seq, np.float32)
    a, b = outs["gelu"], outs["gelu_tanh"]
    assert np.isfinite(b).all()
    assert not np.array_equal(a, b)
    assert np.abs(a - b).max() < 0.15  # small perturbation, not a rewrite
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.999


def test_hidden_act_unknown_raises(rng):
    import jax

    ids = jnp.asarray(rng.randint(0, 97, size=(1, 4)), jnp.int32)
    model = BertImgModel(small_cfg(hidden_act="relu6"))
    with pytest.raises(ValueError, match="hidden_act"):
        model.init(jax.random.PRNGKey(0), ids, jnp.ones((1, 4), jnp.int32))


def test_fused_qkv_matches_separate(rng):
    """fused_qkv computes the identical projection (the three kernels are
    independent column blocks of the fused GEMM) over the UNCHANGED param
    tree — params init'd by one variant must apply bit-compatibly under
    the other."""
    import jax

    ids = jnp.asarray(rng.randint(0, 97, size=(2, 9)), jnp.int32)
    mask = jnp.ones((2, 9), jnp.int32)
    m_sep = BertImgModel(small_cfg(fused_qkv=False))
    m_fused = BertImgModel(small_cfg(fused_qkv=True))
    params = m_sep.init(jax.random.PRNGKey(0), ids, mask)
    seq_sep, _, _, _ = m_sep.apply(params, ids, mask)
    seq_fused, _, _, _ = m_fused.apply(params, ids, mask)
    np.testing.assert_allclose(np.asarray(seq_sep), np.asarray(seq_fused),
                               atol=2e-5)

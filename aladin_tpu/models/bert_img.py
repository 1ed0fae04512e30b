"""The OSCAR/VinVL cross-modal BERT backbone, rebuilt as Flax modules.

Behavioral contract (ref:oscar/modeling/modeling_bert.py:150-279 BertImgModel
plus the vendored pytorch_transformers BERT internals it extends):

  * text path: word + absolute-position + token-type embeddings ->
    LayerNorm(eps=1e-12) -> dropout;
  * image path: Linear(img_feature_dim -> hidden) on the 2054-d region
    features (2048 visual + 6 box geometry), optional LayerNorm
    (eps=img_layer_norm_eps), dropout - NO position/type embeddings
    (ref:modeling_bert.py:249-266);
  * streams concatenated along the token axis (text first,
    ref:modeling_bert.py:269);
  * additive attention bias (1 - mask) * -10000 broadcast over heads
    (ref:modeling_bert.py:213-226), accepting 1-D (B, K) or 2-D (B, Q, K)
    masks;
  * 12 post-LN encoder layers: self-attention -> dense -> dropout ->
    LN(x + res); intermediate GELU (exact erf form, the pytorch_transformers
    'gelu') -> output dense -> dropout -> LN(+res);
  * pooler: tanh(Linear(token 0)) - used by the OSCAR pair classifier only;
  * returns (sequence_output, pooled, all_hidden_states, all_attentions),
    hidden states being the 12 pre-layer states + the final one (13 entries),
    exactly like output_hidden_states=True upstream.

TPU notes: everything is static-shaped; compute dtype is a constructor knob
(bf16 on TPU, f32 params); attention is a plain dot-product chain that XLA
fuses - sequence lengths here are <=134 tokens, far below the flash-attention
crossover, so no custom kernel is warranted (SURVEY.md S5.7).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import Array

from aladin_tpu.ops.masking import additive_attention_bias


@dataclasses.dataclass(frozen=True)
class BertImgConfig:
    """Mirrors the BertConfig fields the backbone consumes (VinVL-base)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    img_feature_dim: int = 2054
    img_feature_type: str = "frcnn"
    use_img_layernorm: bool = True
    img_layer_norm_eps: float = 1e-12
    num_labels: int = 2  # OSCAR pair classifier (matched / not-matched)
    # TPU-native: rematerialize encoder layers in the backward pass (trade
    # FLOPs for HBM - enables much larger batches on one chip)
    remat: bool = False
    # TPU-native: run the encoder's fused QKV and FFN-up projections as
    # W8A8 dynamic int8 on the double-rate MXU mode — eval/serving only
    # (models/quant.py; same param pytree, checkpoints load unchanged).
    # attention-out / FFN-down stay bf16 (chip-measured: int8 loses there).
    quant_matmuls: bool = False
    # TPU-native: FFN activation. 'gelu' = exact erf — reference / HF /
    # released-checkpoint parity (ref:oscar BERT uses the erf form; locked
    # by tests/test_models.py::test_text_path_matches_hf). 'gelu_tanh' =
    # the tanh approximation: chip-measured 14.1->7.2 ms forward and
    # 38.4->7.7 ms fwd+bwd for the step's 12 (17k, 3072) activations at
    # B=128 — the erf BACKWARD is transcendental-bound on the VPU. Use
    # for from-scratch / finetune training where bit-parity with released
    # erf checkpoints is not required.
    hidden_act: str = "gelu"
    # TPU-native EXPERIMENT, measured and kept OFF: fuse each residual-add
    # + LayerNorm into one Pallas VMEM pass with an analytic custom_vjp
    # backward (ops/pallas/layernorm.py). Chip A/B (round 4): train step
    # NEUTRAL (B=128 116.0->117.5 ms, B=32 41.5->41.2 — XLA already fuses
    # the residual+LN chain); 25k-row encode 22% SLOWER (6.79->8.28 s).
    # With quant_matmuls it additionally routes the activation quantize
    # into the LN epilogue feeding pre-quantized int8 to the W8A8 GEMMs —
    # also measured SLOWER than the in-GEMM dynamic quantize (9.45 vs
    # ~6.7 s encode), making bf16 the third-time-confirmed encode winner.
    # The knob stays for profiling/ablation; defaults ship the XLA path.
    fused_layernorm: bool = False
    # TPU-native: compute Q/K/V as one (D, 3D) GEMM over trace-time
    # concatenated kernels (param tree unchanged, math identical - the three
    # kernels are independent column blocks). Same-process chip A/B at
    # B=128: +4.8% with exact-erf gelu but -3.8% with gelu_tanh (an XLA
    # scheduling interaction, not a robust win) - so OFF by default; a
    # tuning knob for a given config, not a recommendation.
    fused_qkv: bool = False
    # TPU-native: one Pallas VMEM pass per batch row for the whole
    # QK^T + bias + softmax + dropout + PV chain, all heads, with an exact
    # recompute backward (ops/pallas/attention_kernel.py) — specialized to
    # this backbone's <=134-token sequences (the regime where generic flash
    # kernels lose 2.3x, round-3 measured rejection). Math identical at
    # dropout 0 (test-locked); with dropout the mask comes from the TPU PRNG
    # instead of the flax 'dropout' stream (same distribution, different
    # draws — the rng_impl='rbg' precedent). Not compatible with
    # output_attentions (the probs are never materialized); the encoder
    # falls back to the XLA chain for that call. A/B numbers: README
    # roofline paragraph.
    fused_attention: bool = False

    @classmethod
    def from_json_dict(cls, d: dict) -> "BertImgConfig":
        keep = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in keep}
        if "use_img_layernorm" in d:
            kwargs["use_img_layernorm"] = bool(d["use_img_layernorm"])
        if d.get("hidden_act") == "gelu_new":  # HF's name for the tanh form
            kwargs["hidden_act"] = "gelu_tanh"
        return cls(**kwargs)


def _dense_init(cfg: BertImgConfig):
    return nn.initializers.normal(stddev=cfg.initializer_range)


def _ffn_act(x: Array, name: str) -> Array:
    """The configured FFN activation (see BertImgConfig.hidden_act)."""
    if name == "gelu":
        # exact erf, BERT-era. An analytic custom_vjp (ops/activations.py)
        # was chip-A/B'd at B=128: NEUTRAL (110.9 vs 110.9 ms/step, same
        # loss) — JAX's erfc derivative rule already uses exp(-x^2) and XLA
        # keeps the forward's erfc as a residual, so autodiff never
        # re-evaluates it. The erf-vs-tanh gap lives in the FORWARD
        # polynomial; plain autodiff stays the default.
        return jax.nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown hidden_act {name!r} (gelu | gelu_tanh)")


class _ProjParams(nn.Module):
    """Declares an nn.Dense-identical (kernel, bias) param pair WITHOUT
    computing - lets the quant path fuse several projections into one
    GEMM (e.g. QKV) while the checkpoint param tree stays bit-identical
    to the bf16 model's."""

    features: int
    d_in: int
    kernel_init: Any

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.d_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias


class BertSelfAttention(nn.Module):
    """Multi-head self-attention with additive bias; optionally returns probs."""

    cfg: BertImgConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, bias: Array, deterministic: bool,
                 x_q8: Optional[Tuple[Array, Array]] = None) -> Tuple[Array, Array]:
        cfg = self.cfg
        h, d = cfg.num_attention_heads, cfg.hidden_size // cfg.num_attention_heads
        if cfg.quant_matmuls or cfg.fused_qkv:
            # Fused QKV: one (D, 3D) GEMM over trace-time-concatenated
            # kernels. Param tree unchanged (query/key/value declared
            # separately); math identical (the three kernels are independent
            # column blocks). For int8 the single GEMM is what makes W8A8
            # QKV beat three bf16 dots: the in-kernel per-row activation
            # quantize (serial VPU work, ~1.4us per 256-row tile) is paid
            # once instead of three times, and the concat+quantize is
            # loop-invariant so XLA hoists it out of encode scans. For bf16
            # see the fused_qkv config-field comment (A/B'd; off by default).
            parts = [
                _ProjParams(cfg.hidden_size, cfg.hidden_size, _dense_init(cfg),
                            name=nm)()
                for nm in ("query", "key", "value")
            ]
            wcat = jnp.concatenate([p[0] for p in parts], axis=1)
            bcat = jnp.concatenate([p[1] for p in parts])
            if cfg.quant_matmuls and x_q8 is not None:
                # activations quantized upstream by the fused-LN epilogue
                # (ops/pallas/layernorm.py) — the GEMM runs pure int8 MXU
                from aladin_tpu.models.quant import w8a8_apply_xq

                qkv = w8a8_apply_xq(x_q8[0], x_q8[1], wcat, bcat,
                                    out_dtype=self.dtype)
            elif cfg.quant_matmuls:
                from aladin_tpu.models.quant import w8a8_apply

                qkv = w8a8_apply(x, wcat, bcat, out_dtype=self.dtype)
            else:
                qkv = x @ wcat.astype(self.dtype) + bcat.astype(self.dtype)
            q, k, v = (
                a.reshape(*x.shape[:-1], h, d) for a in jnp.split(qkv, 3, axis=-1)
            )
        else:
            dense = lambda name: nn.Dense(  # noqa: E731
                cfg.hidden_size, dtype=self.dtype, kernel_init=_dense_init(cfg),
                name=name
            )
            q = dense("query")(x).reshape(*x.shape[:-1], h, d)
            k = dense("key")(x).reshape(*x.shape[:-1], h, d)
            v = dense("value")(x).reshape(*x.shape[:-1], h, d)
        if cfg.fused_attention:
            # one VMEM pass per batch row, no (B,H,Q,K) materialization, no
            # layout transposes; probs are never formed (encoder guards
            # output_attentions). Dropout mask from the TPU PRNG, seeded
            # off the flax 'dropout' stream so steps/layers decorrelate.
            from aladin_tpu.ops.pallas.attention_kernel import fused_attention

            rate = float(cfg.attention_probs_dropout_prob)
            train = not deterministic and rate > 0.0
            seed = None
            if train:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max)
            ctx = fused_attention(
                q, k, v, bias[:, 0].astype(jnp.float32), seed, rate, train,
                interpret=jax.default_backend() != "tpu")
            return ctx.reshape(*x.shape[:-1], cfg.hidden_size), None

        # scores: (B, H, Q, K)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(d, jnp.float32))
        scores = scores + bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs_dropped = nn.Dropout(cfg.attention_probs_dropout_prob)(
            probs, deterministic=deterministic
        )
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs_dropped, v)
        ctx = ctx.reshape(*x.shape[:-1], cfg.hidden_size)
        return ctx, probs


class _ResidualLN(nn.Module):
    """``LayerNorm(x + res)`` with an nn.LayerNorm-identical param pair
    (scale, bias) so checkpoints are oblivious to the kernel choice.

    Routes to the fused Pallas kernel (ops/pallas/layernorm.py) when
    cfg.fused_layernorm; ``emit_q8`` additionally returns the int8
    per-row quantization of the output for the W8A8 GEMMs downstream."""

    epsilon: float
    dtype: Any
    fused: bool
    emit_q8: bool = False

    @nn.compact
    def __call__(self, x: Array, res: Array):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (d,), jnp.float32)
        from aladin_tpu.ops.pallas.layernorm import (
            residual_layernorm, residual_layernorm_q8)

        impl = "auto" if self.fused else "xla"
        if self.emit_q8:
            y, q, s = residual_layernorm_q8(x.astype(self.dtype),
                                            res.astype(self.dtype),
                                            scale, bias, self.epsilon, impl)
            return y, (q, s)
        return residual_layernorm(x.astype(self.dtype), res.astype(self.dtype),
                                  scale, bias, self.epsilon, impl), None


class BertLayer(nn.Module):
    """One post-LN BERT encoder layer.

    ``x_q8`` (quant serving mode only) is the int8 quantization of ``x``
    produced by the PREVIOUS layer's output-LN epilogue (or the layer-0
    seed); the layer likewise returns its own output's (q, s) so the next
    layer's QKV GEMM never re-reads or re-quantizes the hidden state."""

    cfg: BertImgConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, bias: Array, deterministic: bool,
                 x_q8: Optional[Tuple[Array, Array]] = None):
        cfg = self.cfg
        # LN-epilogue int8 experiment: only when BOTH knobs are on (see
        # the fused_layernorm config-field comment for the measured verdict)
        quant_ln = cfg.quant_matmuls and cfg.fused_layernorm
        ctx, probs = BertSelfAttention(cfg, self.dtype, name="attention")(
            x, bias, deterministic, x_q8
        )
        # attention_output and the FFN down-projection stay bf16 even in
        # quant mode: chip-measured, int8 LOSES there (N=768 GEMMs are too
        # small to amortize the in-kernel quantize, and the 3072-wide
        # FFN-down input makes its quantize pass dominate the dot). The
        # int8 wins are QKV (fused, one quantize) and FFN-up (+gelu
        # epilogue); fewer quantization points also means higher fidelity.
        attn_out = nn.Dense(
            cfg.hidden_size, dtype=self.dtype, kernel_init=_dense_init(cfg), name="attention_output"
        )(ctx)
        attn_out = nn.Dropout(cfg.hidden_dropout_prob)(attn_out, deterministic=deterministic)
        if cfg.fused_layernorm:
            x, ln1_q8 = _ResidualLN(cfg.layer_norm_eps, self.dtype, fused=True,
                                    emit_q8=quant_ln, name="attention_layernorm")(x, attn_out)
        else:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="attention_layernorm")(x + attn_out)
            ln1_q8 = None
        # configured gelu variant (cfg.hidden_act); on the quant path it
        # rides the GEMM kernel's fused epilogue instead of a separate HBM pass
        if quant_ln:
            from aladin_tpu.models.quant import w8a8_apply_xq

            ik, ib = _ProjParams(cfg.intermediate_size, cfg.hidden_size,
                                 _dense_init(cfg), name="intermediate")()
            inter = w8a8_apply_xq(ln1_q8[0], ln1_q8[1], ik, ib,
                                  activation=cfg.hidden_act, out_dtype=self.dtype)
        elif cfg.quant_matmuls:
            from aladin_tpu.models.quant import QuantDense

            inter = QuantDense(
                cfg.intermediate_size, dtype=self.dtype, kernel_init=_dense_init(cfg),
                name="intermediate", activation=cfg.hidden_act,
            )(x)
        else:
            inter = nn.Dense(
                cfg.intermediate_size, dtype=self.dtype, kernel_init=_dense_init(cfg),
                name="intermediate",
            )(x)
            inter = _ffn_act(inter, cfg.hidden_act)
        out = nn.Dense(
            cfg.hidden_size, dtype=self.dtype, kernel_init=_dense_init(cfg), name="output"
        )(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        if cfg.fused_layernorm:
            x, ln2_q8 = _ResidualLN(cfg.layer_norm_eps, self.dtype, fused=True,
                                    emit_q8=quant_ln, name="output_layernorm")(x, out)
        else:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="output_layernorm")(x + out)
            ln2_q8 = None
        return x, probs, ln2_q8


class BertImgModel(nn.Module):
    """Backbone over concatenated text tokens + projected region features.

    Call with ``img_feats=None`` for a text-only pass (ALADIN's disentangled
    caption branch, ref:alad/alad_model.py:125-131) or with (B, R, 2054)
    region features for the image branch (ref:alad/alad_model.py:134-140).
    """

    cfg: BertImgConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Array,  # (B, L) int32
        attention_mask: Array,  # (B, L [+R]) 1/0 or (B, Q, K)
        token_type_ids: Optional[Array] = None,
        img_feats: Optional[Array] = None,  # (B, R, img_feature_dim)
        deterministic: bool = True,
        output_attentions: bool = False,
        output_hidden_states: bool = False,
    ):
        cfg = self.cfg
        b, l = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        emb_init = _dense_init(cfg)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, embedding_init=emb_init,
                        dtype=self.dtype, name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(l, dtype=jnp.int32)[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, embedding_init=emb_init,
                       dtype=self.dtype, name="position_embeddings")(pos_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, embedding_init=emb_init,
                       dtype=self.dtype, name="token_type_embeddings")(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="embeddings_layernorm")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)

        if img_feats is not None:
            img = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=emb_init,
                           name="img_embedding")(img_feats.astype(self.dtype))
            if cfg.use_img_layernorm:
                img = nn.LayerNorm(epsilon=cfg.img_layer_norm_eps, dtype=self.dtype,
                                   name="img_layernorm")(img)
            img = nn.Dropout(cfg.hidden_dropout_prob)(img, deterministic=deterministic)
            x = jnp.concatenate([x, img], axis=1)  # text first (ref :269)

        if output_attentions and cfg.fused_attention:
            raise ValueError(
                "fused_attention never materializes the attention probs; "
                "disable BertImgConfig.fused_attention for "
                "output_attentions consumers (attention distillation, "
                "probe tooling)")
        bias = additive_attention_bias(attention_mask, dtype=jnp.float32)

        layer_cls = BertLayer
        if cfg.remat:
            # static_argnums counts self at 0: (x, bias, deterministic) -> 3
            layer_cls = nn.remat(BertLayer, static_argnums=(3,))

        # LN-epilogue quant experiment (quant_matmuls + fused_layernorm):
        # seed the int8 activation stream for layer 0's QKV; every layer's
        # output-LN epilogue re-quantizes for the next one
        # (ops/pallas/layernorm.py — quantize off the GEMM critical path)
        x_q8 = None
        if cfg.quant_matmuls and cfg.fused_layernorm:
            from aladin_tpu.ops.pallas.layernorm import layernorm_q8

            x_q8 = layernorm_q8(x.astype(self.dtype))

        hidden_states = [x]
        attentions = []
        for i in range(cfg.num_hidden_layers):
            x, probs, x_q8 = layer_cls(cfg, self.dtype, name=f"layer_{i}")(
                x, bias, deterministic, x_q8)
            if output_hidden_states:
                hidden_states.append(x)
            if output_attentions:
                attentions.append(probs)

        pooled = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=emb_init,
                          name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)

        # (13, B, S, D) like output_hidden_states=True upstream; None when
        # not requested (a 2.7 GB retained buffer at B=1024 otherwise)
        all_hidden = jnp.stack(hidden_states, axis=0) if output_hidden_states else None
        all_attn = jnp.stack(attentions, axis=0) if output_attentions else None
        return x, pooled, all_hidden, all_attn


class ImageBertClassifier(nn.Module):
    """OSCAR pair classifier head: CLS pooled -> dropout -> Linear(num_labels)
    (ref:oscar/modeling/modeling_bert.py:290-354). The 'entangled teacher'
    scoring path (ref:alad/train.py:340-384) builds on this."""

    cfg: BertImgConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None, img_feats=None,
                 deterministic: bool = True, output_attentions: bool = False):
        seq, pooled, hidden, attn = BertImgModel(self.cfg, self.dtype, name="bert")(
            input_ids, attention_mask, token_type_ids, img_feats,
            deterministic, output_attentions,
        )
        pooled = nn.Dropout(self.cfg.hidden_dropout_prob)(pooled, deterministic=deterministic)
        logits = nn.Dense(self.cfg.num_labels, dtype=self.dtype,
                          kernel_init=_dense_init(self.cfg), name="classifier")(pooled)
        return logits, seq, hidden, attn

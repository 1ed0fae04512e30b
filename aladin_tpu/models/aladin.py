"""The ALADIN model: disentangled dual-pass OSCAR backbone + two heads.

Behavioral contract (ref:alad/alad_model.py:29-247,
JointTextImageTransformerEncoder.forward):

  * caption branch: backbone over caption tokens only (img_feats=None);
  * image branch: backbone over OD-label tokens + projected region features;
    region token outputs are sliced out (positions [L_t : L_t+R],
    ref:alad_model.py:175);
  * optional depth aggregation over the 13-entry hidden-state stack, for the
    alignment side (first 12 states aggregated then fused with the last,
    ref:alad_model.py:163-172) and/or the matching side
    (ref:alad_model.py:177-193), optionally with a post-OSCAR TE;
  * optional per-modality TERAN transformer stacks (teran-layers > 0,
    shared or separate, ref:alad_model.py:200-219);
  * matching head: a tern-layers-deep torch-style TE over the token set; its
    position-0 output is THE global embedding (ref:alad_model.py:231-235);
  * alignment head consumes the (F.normalize-d) token sets directly;
  * globals are l2-normalized with the bare-division l2norm
    (ref:alad_model.py:237-241).

The shipped recipes run with teran-layers=0 and no depth aggregation, so both
heads read the raw backbone outputs.

Layout: batch-first everywhere; shapes are static (pad text to max_seq_len,
regions to max_img_seq_len); lengths ride along as int32 arrays.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import flax.struct
import jax.numpy as jnp
from jax import Array

from aladin_tpu.config import ExperimentConfig
from aladin_tpu.models.bert_img import BertImgConfig, BertImgModel
from aladin_tpu.models.layers import DepthAggregator, FeatureFusion, TorchTransformerEncoder
from aladin_tpu.ops.masking import padding_mask
from aladin_tpu.ops.similarity import l2norm


@flax.struct.dataclass
class Batch:
    """One disentangled retrieval batch (the MyCollate output,
    ref:alad/dataset.py:332-361, in static-shape form)."""

    txt_ids: Array  # (B, L_t) int32 - caption tokens, CLS...SEP + pad
    txt_mask: Array  # (B, L_t) 1/0
    txt_type: Array  # (B, L_t) int32 segment ids
    cap_len: Array  # (B,) int32 - real caption length incl. CLS/SEP
    img_ids: Array  # (B, L_t) int32 - OD-label tokens ([UNK]...SEP + pad)
    img_mask: Array  # (B, L_t + R) 1/0 over label tokens + regions
    img_type: Array  # (B, L_t) int32
    img_feats: Array  # (B, R, 2054) float - region features + box geometry
    img_len: Array  # (B,) int32 - number of real regions


@flax.struct.dataclass
class AladinOutputs:
    img_global: Array  # (B, D) l2-normalized matching-head image embedding
    cap_global: Array  # (B, D) l2-normalized matching-head caption embedding
    img_set: Array  # (B, R, D) normalized region token set (alignment head)
    cap_seq: Array  # (B, L_t, D) normalized caption token sequence
    img_len: Array  # (B,)
    cap_len: Array  # (B,)
    l1_reg: Array  # scalar hidden-state L1 regularizer (0 unless configured)


class ALADIN(nn.Module):
    """Disentangled dual-encoder with alignment + matching heads."""

    cfg: ExperimentConfig
    bert_cfg: BertImgConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Batch, deterministic: bool = True) -> AladinOutputs:
        mc = self.cfg.model
        embed = mc.embed_size
        # The reference defines img_proj/cap_proj(hidden -> embed) but never
        # applies them (commented out, ref:alad_model.py:201,211), so
        # embed-size must equal the backbone hidden size there too.
        assert embed == self.bert_cfg.hidden_size, (
            f"embed-size ({embed}) must match the backbone hidden size "
            f"({self.bert_cfg.hidden_size}); the reference's projection "
            "layers are dead code"
        )
        backbone = BertImgModel(self.bert_cfg, self.dtype, name="oscar")

        # The hidden-state stack is only materialized when a consumer exists
        # (depth aggregation / L1 regularizer) - it is a multi-GB buffer at
        # large batch and the shipped configs never read it.
        need_hidden = bool(
            mc.depth_aggregation_alignment
            or mc.depth_aggregation_matching
            or "regularizehidden" in self.cfg.training.loss_types
        )
        txt_seq, _, txt_hidden, _ = backbone(
            batch.txt_ids, batch.txt_mask, batch.txt_type, None, deterministic,
            output_hidden_states=need_hidden,
        )
        img_seq, _, img_hidden, _ = backbone(
            batch.img_ids, batch.img_mask, batch.img_type, batch.img_feats, deterministic,
            output_hidden_states=need_hidden,
        )

        l_t = batch.txt_ids.shape[1]
        r = batch.img_feats.shape[1]
        txt_pad = padding_mask(batch.cap_len, l_t)  # True = pad
        img_pad = padding_mask(batch.img_len, r)

        region_hidden = img_hidden[:, :, l_t : l_t + r, :] if need_hidden else None
        cap_hidden = txt_hidden[:, :, :l_t, :] if need_hidden else None

        # ---- alignment-side token sets (ref:alad_model.py:163-175) ----
        if mc.depth_aggregation_alignment:
            da = DepthAggregator(mc.depth_aggregation_alignment, embed, self.dtype,
                                 name="depth_aggregator_alignment")
            fuse = FeatureFusion(embed, self.dtype, name="feature_fusion")
            i_teran = fuse(da(region_hidden[:-1], img_pad, deterministic),
                           region_hidden[-1], deterministic)
            c_teran = fuse(da(cap_hidden[:-1], txt_pad, deterministic),
                           cap_hidden[-1], deterministic)
        else:
            c_teran = txt_seq[:, :l_t]
            i_teran = img_seq[:, l_t : l_t + r]

        # ---- matching-side inputs (ref:alad_model.py:177-196) ----
        if mc.depth_aggregation_matching:
            img_stack, cap_stack = region_hidden, cap_hidden
            if mc.post_layers > 0:
                post = TorchTransformerEncoder(
                    mc.post_layers, embed, nhead=4, dim_feedforward=embed,
                    dropout=mc.dropout, dtype=self.dtype, name="post_oscar_transformer")
                img_stack = jnp.concatenate(
                    [img_stack, post(i_teran, img_pad, deterministic)[None]], axis=0)
                cap_stack = jnp.concatenate(
                    [cap_stack, post(c_teran, txt_pad, deterministic)[None]], axis=0)
            dam = DepthAggregator(mc.depth_aggregation_matching, embed, self.dtype,
                                  name="depth_aggregator_matching")
            i_emb = dam(img_stack, img_pad, deterministic)
            c_emb = dam(cap_stack, txt_pad, deterministic)
        else:
            c_emb, i_emb = c_teran, i_teran

        # ---- optional per-modality TERAN stacks (ref:alad_model.py:200-219) ----
        if mc.teran_layers > 0 and mc.text_aggregation is not None:
            te1 = TorchTransformerEncoder(
                mc.teran_layers, embed, nhead=4, dim_feedforward=embed,
                dropout=mc.dropout, dtype=self.dtype, name="transformer_encoder_1")
            cap_set = te1(c_teran, txt_pad, deterministic)
            if mc.shared_transformer:
                img_set = te1(i_teran, img_pad, deterministic)
            else:
                te2 = TorchTransformerEncoder(
                    mc.teran_layers, embed, nhead=4, dim_feedforward=embed,
                    dropout=mc.dropout, dtype=self.dtype, name="transformer_encoder_2")
                img_set = te2(i_teran, img_pad, deterministic)
        else:
            cap_set, img_set = c_teran, i_teran

        # ---- L1 hidden regularizer (ref:alad_model.py:221-228) ----
        if "regularizehidden" in self.cfg.training.loss_types:
            l1_img = jnp.mean(jnp.sum(jnp.abs(region_hidden), axis=-1))
            l1_txt = jnp.mean(jnp.sum(jnp.abs(cap_hidden), axis=-1))
            l1_reg = 0.001 * (l1_img + l1_txt) / 2.0
        else:
            l1_reg = jnp.zeros((), jnp.float32)

        # ---- matching head (ref:alad_model.py:103-108,231-235) ----
        head = TorchTransformerEncoder(
            mc.tern_layers, embed, nhead=4, dim_feedforward=embed,
            dropout=mc.dropout, dtype=self.dtype, name="final_projection_net")
        cap_global = head(c_emb, txt_pad, deterministic)[:, 0, :]
        img_global = head(i_emb, img_pad, deterministic)[:, 0, :]

        # ---- normalization (ref:alad_model.py:237-241) ----
        img_set = l2norm(img_set.astype(jnp.float32), eps=1e-12)
        cap_set = l2norm(cap_set.astype(jnp.float32), eps=1e-12)
        img_global = l2norm(img_global.astype(jnp.float32))
        cap_global = l2norm(cap_global.astype(jnp.float32))

        return AladinOutputs(
            img_global=img_global,
            cap_global=cap_global,
            img_set=img_set,
            cap_seq=cap_set,
            img_len=batch.img_len,
            cap_len=batch.cap_len,
            l1_reg=l1_reg,
        )

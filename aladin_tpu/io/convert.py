"""PyTorch checkpoint -> Flax parameter conversion.

Two input families (SURVEY.md S5.4):

  1. OSCAR/HF format: a checkpoint *directory* holding ``pytorch_model.bin``
     (an ImageBertForSequenceClassification state dict in pytorch_transformers
     naming), ``config.json``, ``vocab.txt``, ``training_args.bin``
     (ref:alad/alad_model.py:38-43 loads it via from_pretrained).
  2. ALADIN format: a single ``.pth.tar`` dict
     {epoch, model, optimizer, scheduler, opt, config, Eiters}
     (ref:alad/train.py:329-337); ``model`` keys are prefixed
     ``img_txt_enc.``.

torch is used host-side only (CPU tensor reading); nothing torch touches the
device path.

Name mapping (torch -> our flax tree):

  bert.embeddings.word_embeddings.weight      -> oscar/word_embeddings/embedding
  bert.embeddings.position_embeddings.weight  -> oscar/position_embeddings/embedding
  bert.embeddings.token_type_embeddings.weight-> oscar/token_type_embeddings/embedding
  bert.embeddings.LayerNorm.{weight,bias}     -> oscar/embeddings_layernorm/{scale,bias}
  bert.encoder.layer.N.attention.self.{query,key,value}.{weight,bias}
                                              -> oscar/layer_N/attention/{query,key,value}
  bert.encoder.layer.N.attention.output.dense -> oscar/layer_N/attention_output
  bert.encoder.layer.N.attention.output.LayerNorm -> oscar/layer_N/attention_layernorm
  bert.encoder.layer.N.intermediate.dense     -> oscar/layer_N/intermediate
  bert.encoder.layer.N.output.dense           -> oscar/layer_N/output
  bert.encoder.layer.N.output.LayerNorm       -> oscar/layer_N/output_layernorm
  bert.img_embedding.{weight,bias}            -> oscar/img_embedding
  bert.LayerNorm.{weight,bias}                -> oscar/img_layernorm   (image-feature LN)
  bert.pooler.dense.{weight,bias}             -> oscar/pooler
  classifier.{weight,bias}                    -> classifier            (OSCAR head)

torch nn.TransformerEncoder heads (matching head, TERAN stacks, post-OSCAR):

  <stack>.layers.N.self_attn.in_proj_{weight,bias}  -> split 3-way into
        <stack>/layer_N/self_attn/{q,k,v}_proj
  <stack>.layers.N.self_attn.out_proj               -> .../self_attn/out_proj
  <stack>.layers.N.linear{1,2}                      -> .../linear{1,2}
  <stack>.layers.N.norm{1,2}                        -> .../norm{1,2}

Linear weights are transposed (torch stores (out, in); flax Dense (in, out)).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _dense(tree, path, weight, bias) -> None:
    _set(tree, path + ("kernel",), _np(weight).T)
    if bias is not None:
        _set(tree, path + ("bias",), _np(bias))


def _layernorm(tree, path, weight, bias) -> None:
    _set(tree, path + ("scale",), _np(weight))
    _set(tree, path + ("bias",), _np(bias))


_BERT_LAYER_RE = re.compile(r"^encoder\.layer\.(\d+)\.(.+)$")
_TE_LAYER_RE = re.compile(r"^layers\.(\d+)\.(.+)$")


def convert_bert_state(sd: Dict[str, Any], tree: Dict[str, Any], out_prefix: str = "oscar") -> None:
    """Convert a BertImgModel state dict (keys WITHOUT the leading 'bert.')."""
    g = lambda k: sd[k]  # noqa: E731
    p = (out_prefix,) if out_prefix else ()
    _set(tree, p + ("word_embeddings", "embedding"), _np(g("embeddings.word_embeddings.weight")))
    _set(tree, p + ("position_embeddings", "embedding"),
         _np(g("embeddings.position_embeddings.weight")))
    _set(tree, p + ("token_type_embeddings", "embedding"),
         _np(g("embeddings.token_type_embeddings.weight")))
    _layernorm(tree, p + ("embeddings_layernorm",), g("embeddings.LayerNorm.weight"),
               g("embeddings.LayerNorm.bias"))

    n_layers = 1 + max(
        int(m.group(1)) for k in sd if (m := _BERT_LAYER_RE.match(k))
    )
    for i in range(n_layers):
        src = f"encoder.layer.{i}."
        dst = p + (f"layer_{i}",)
        for name in ("query", "key", "value"):
            _dense(tree, dst + ("attention", name),
                   g(src + f"attention.self.{name}.weight"),
                   g(src + f"attention.self.{name}.bias"))
        _dense(tree, dst + ("attention_output",),
               g(src + "attention.output.dense.weight"), g(src + "attention.output.dense.bias"))
        _layernorm(tree, dst + ("attention_layernorm",),
                   g(src + "attention.output.LayerNorm.weight"),
                   g(src + "attention.output.LayerNorm.bias"))
        _dense(tree, dst + ("intermediate",),
               g(src + "intermediate.dense.weight"), g(src + "intermediate.dense.bias"))
        _dense(tree, dst + ("output",),
               g(src + "output.dense.weight"), g(src + "output.dense.bias"))
        _layernorm(tree, dst + ("output_layernorm",),
                   g(src + "output.LayerNorm.weight"), g(src + "output.LayerNorm.bias"))

    if "img_embedding.weight" in sd:
        _dense(tree, p + ("img_embedding",), g("img_embedding.weight"), g("img_embedding.bias"))
    if "LayerNorm.weight" in sd:  # image-feature LayerNorm (ref:modeling_bert.py:181)
        _layernorm(tree, p + ("img_layernorm",), g("LayerNorm.weight"), g("LayerNorm.bias"))
    if "pooler.dense.weight" in sd:
        _dense(tree, p + ("pooler",), g("pooler.dense.weight"), g("pooler.dense.bias"))


def convert_torch_te_state(sd: Dict[str, Any], tree: Dict[str, Any], out_prefix: str) -> None:
    """Convert a torch nn.TransformerEncoder state dict (keys relative to the
    stack, e.g. 'layers.0.self_attn.in_proj_weight')."""
    layers: Dict[int, Dict[str, Any]] = {}
    for k, v in sd.items():
        m = _TE_LAYER_RE.match(k)
        if m:
            layers.setdefault(int(m.group(1)), {})[m.group(2)] = v
    for i, lsd in layers.items():
        dst = (out_prefix, f"layer_{i}")
        w = _np(lsd["self_attn.in_proj_weight"])  # (3E, E)
        b = _np(lsd["self_attn.in_proj_bias"])  # (3E,)
        e = w.shape[1]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _dense(tree, dst + ("self_attn", name), w[j * e : (j + 1) * e], b[j * e : (j + 1) * e])
        _dense(tree, dst + ("self_attn", "out_proj"),
               lsd["self_attn.out_proj.weight"], lsd["self_attn.out_proj.bias"])
        _dense(tree, dst + ("linear1",), lsd["linear1.weight"], lsd["linear1.bias"])
        _dense(tree, dst + ("linear2",), lsd["linear2.weight"], lsd["linear2.bias"])
        _layernorm(tree, dst + ("norm1",), lsd["norm1.weight"], lsd["norm1.bias"])
        _layernorm(tree, dst + ("norm2",), lsd["norm2.weight"], lsd["norm2.bias"])


def _strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def load_oscar_checkpoint(checkpoint_dir: str):
    """OSCAR/VinVL checkpoint dir -> (flax param tree, BertImgConfig).

    Mirrors ImageBertForSequenceClassification.from_pretrained
    (ref:alad/alad_model.py:38-43) minus torch: reads config.json +
    pytorch_model.bin and emits our parameter tree.
    """
    import torch  # host-side only

    from aladin_tpu.models.bert_img import BertImgConfig

    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        cfg = BertImgConfig.from_json_dict(json.load(f))
    sd = torch.load(
        os.path.join(checkpoint_dir, "pytorch_model.bin"), map_location="cpu",
        weights_only=True,
    )
    tree: Dict[str, Any] = {}
    convert_bert_state(_strip_prefix(sd, "bert."), tree, "oscar")
    if "classifier.weight" in sd:
        _dense(tree, ("classifier",), sd["classifier.weight"], sd["classifier.bias"])
    return tree, cfg


# ALADIN .pth.tar module names -> our flax top-level module names
_ALADIN_STACKS = {
    "final_projection_net": "final_projection_net",
    "transformer_encoder_1": "transformer_encoder_1",
    "transformer_encoder_2": "transformer_encoder_2",
    "post_oscar_transformer": "post_oscar_transformer",
}


def load_aladin_checkpoint(path: str):
    """ALADIN ``.pth.tar`` -> (flax param tree, embedded config dict, meta).

    The checkpoint is a dict {epoch, model, optimizer, scheduler, opt, config,
    Eiters} (ref:alad/train.py:329-337); model keys carry the
    ``img_txt_enc.`` prefix and the backbone under
    ``img_txt_enc.oscar_model.bert.``.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"]
    sd = {k[len("img_txt_enc."):]: v for k, v in sd.items() if k.startswith("img_txt_enc.")}

    tree: Dict[str, Any] = {}
    bert_sd = _strip_prefix(sd, "oscar_model.bert.")
    if bert_sd:
        convert_bert_state(bert_sd, tree, "oscar")
    for torch_name, flax_name in _ALADIN_STACKS.items():
        sub = _strip_prefix(sd, torch_name + ".")
        if sub:
            convert_torch_te_state(sub, tree, flax_name)
    # Depth aggregators / feature fusion, when present
    for torch_name, flax_name in (
        ("depth_aggregator_model_alignment", "depth_aggregator_alignment"),
        ("depth_aggregator_model_matching", "depth_aggregator_matching"),
    ):
        sub = _strip_prefix(sd, torch_name + ".")
        if "self_attn.in_proj_weight" in sub:
            w, b = _np(sub["self_attn.in_proj_weight"]), _np(sub["self_attn.in_proj_bias"])
            e = w.shape[1]
            for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
                _dense(tree, (flax_name, "self_attn", name),
                       w[j * e : (j + 1) * e], b[j * e : (j + 1) * e])
            _dense(tree, (flax_name, "self_attn", "out_proj"),
                   sub["self_attn.out_proj.weight"], sub["self_attn.out_proj.bias"])
            _dense(tree, (flax_name, "gate_ffn"), sub["gate_ffn.weight"], sub["gate_ffn.bias"])
    ff = _strip_prefix(sd, "feature_fusion.alphas.")
    if ff:
        _dense(tree, ("feature_fusion", "fc1"), ff["0.weight"], ff["0.bias"])
        _dense(tree, ("feature_fusion", "fc2"), ff["3.weight"], ff["3.bias"])

    meta = {"epoch": ckpt.get("epoch", 0), "Eiters": ckpt.get("Eiters", 0)}
    return tree, ckpt.get("config", {}), meta


# ---------------------------------------------------------------------------
# Inverse direction: flax tree -> reference-format state dict / .pth.tar.
# Lets a model trained here be evaluated by the reference code (and gives the
# interop tests a way to build byte-faithful reference checkpoints).
# ---------------------------------------------------------------------------


def _t(a: np.ndarray):
    import torch

    return torch.tensor(np.asarray(a))


def _inv_dense(sd, key: str, node: Dict[str, Any]) -> None:
    sd[key + ".weight"] = _t(node["kernel"]).T.contiguous()
    if "bias" in node:
        sd[key + ".bias"] = _t(node["bias"])


def _inv_layernorm(sd, key: str, node: Dict[str, Any]) -> None:
    sd[key + ".weight"] = _t(node["scale"])
    sd[key + ".bias"] = _t(node["bias"])


def bert_state_dict(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Our ``oscar`` subtree -> BertImgModel torch state dict (inverse of
    :func:`convert_bert_state`; key layout ref:oscar/modeling/modeling_bert.py:150-279)."""
    sd: Dict[str, Any] = {}
    p = prefix
    sd[p + "embeddings.word_embeddings.weight"] = _t(tree["word_embeddings"]["embedding"])
    sd[p + "embeddings.position_embeddings.weight"] = _t(tree["position_embeddings"]["embedding"])
    sd[p + "embeddings.token_type_embeddings.weight"] = _t(tree["token_type_embeddings"]["embedding"])
    _inv_layernorm(sd, p + "embeddings.LayerNorm", tree["embeddings_layernorm"])
    for name, node in tree.items():
        if not name.startswith("layer_"):
            continue
        i = int(name.split("_")[1])
        src = f"{p}encoder.layer.{i}."
        for q in ("query", "key", "value"):
            _inv_dense(sd, src + f"attention.self.{q}", node["attention"][q])
        _inv_dense(sd, src + "attention.output.dense", node["attention_output"])
        _inv_layernorm(sd, src + "attention.output.LayerNorm", node["attention_layernorm"])
        _inv_dense(sd, src + "intermediate.dense", node["intermediate"])
        _inv_dense(sd, src + "output.dense", node["output"])
        _inv_layernorm(sd, src + "output.LayerNorm", node["output_layernorm"])
    if "img_embedding" in tree:
        _inv_dense(sd, p + "img_embedding", tree["img_embedding"])
    if "img_layernorm" in tree:
        _inv_layernorm(sd, p + "LayerNorm", tree["img_layernorm"])
    if "pooler" in tree:
        _inv_dense(sd, p + "pooler.dense", tree["pooler"])
    return sd


def te_state_dict(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Our TorchTransformerEncoder subtree -> torch nn.TransformerEncoder
    state dict (inverse of :func:`convert_torch_te_state`)."""
    import torch

    sd: Dict[str, Any] = {}
    for name, node in tree.items():
        if not name.startswith("layer_"):
            continue
        i = int(name.split("_")[1])
        src = f"{prefix}layers.{i}."
        sa = node["self_attn"]
        ws = [_t(sa[k]["kernel"]).T for k in ("q_proj", "k_proj", "v_proj")]
        bs = [_t(sa[k]["bias"]) for k in ("q_proj", "k_proj", "v_proj")]
        sd[src + "self_attn.in_proj_weight"] = torch.cat(ws, dim=0).contiguous()
        sd[src + "self_attn.in_proj_bias"] = torch.cat(bs, dim=0)
        _inv_dense(sd, src + "self_attn.out_proj", sa["out_proj"])
        _inv_dense(sd, src + "linear1", node["linear1"])
        _inv_dense(sd, src + "linear2", node["linear2"])
        _inv_layernorm(sd, src + "norm1", node["norm1"])
        _inv_layernorm(sd, src + "norm2", node["norm2"])
    return sd


def save_aladin_checkpoint(
    path: str,
    model_tree: Dict[str, Any],
    config: Dict[str, Any],
    epoch: int = 0,
    eiters: int = 0,
) -> str:
    """Write our model param tree as a reference-format ``.pth.tar``
    (dict {epoch, model, optimizer, scheduler, opt, config, Eiters},
    ref:alad/train.py:329-337; keys under ``img_txt_enc.``). The exact
    inverse of :func:`load_aladin_checkpoint` - ``load(save(tree)) == tree``.
    """
    import torch

    sd: Dict[str, Any] = {}
    if "oscar" in model_tree:
        sd.update(bert_state_dict(model_tree["oscar"], "oscar_model.bert."))
    for torch_name, flax_name in _ALADIN_STACKS.items():
        if flax_name in model_tree:
            sd.update(te_state_dict(model_tree[flax_name], torch_name + "."))
    for torch_name, flax_name in (
        ("depth_aggregator_model_alignment", "depth_aggregator_alignment"),
        ("depth_aggregator_model_matching", "depth_aggregator_matching"),
    ):
        if flax_name in model_tree and "self_attn" in model_tree[flax_name]:
            node = model_tree[flax_name]
            sa = node["self_attn"]
            ws = [_t(sa[k]["kernel"]).T for k in ("q_proj", "k_proj", "v_proj")]
            bs = [_t(sa[k]["bias"]) for k in ("q_proj", "k_proj", "v_proj")]
            sd[torch_name + ".self_attn.in_proj_weight"] = torch.cat(ws, dim=0).contiguous()
            sd[torch_name + ".self_attn.in_proj_bias"] = torch.cat(bs, dim=0)
            _inv_dense(sd, torch_name + ".self_attn.out_proj", sa["out_proj"])
            _inv_dense(sd, torch_name + ".gate_ffn", node["gate_ffn"])
    if "feature_fusion" in model_tree:
        node = model_tree["feature_fusion"]
        _inv_dense(sd, "feature_fusion.alphas.0", node["fc1"])
        _inv_dense(sd, "feature_fusion.alphas.3", node["fc2"])

    ckpt = {
        "epoch": int(epoch),
        "model": {"img_txt_enc." + k: v for k, v in sd.items()},
        "optimizer": {},
        "scheduler": None,
        "opt": None,
        "config": config,
        "Eiters": int(eiters),
    }
    torch.save(ckpt, path)
    return path

"""Shared CLI plumbing: flags, model/state construction, data wiring."""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aladin_tpu.config import DataArgs, ExperimentConfig, load_config
from aladin_tpu.data.dataset import RetrievalDataset, make_synthetic_dataset
from aladin_tpu.data.pipeline import BatchLoader
from aladin_tpu.data.tokenizer import BertWordPieceTokenizer
from aladin_tpu.models.aladin import ALADIN
from aladin_tpu.models.bert_img import BertImgConfig


def add_shared_flags(p: argparse.ArgumentParser) -> None:
    """The flag surface the reference exposes (ref:alad/train.py:40-168),
    minus legacy OSCAR-task flags the ALADIN pipeline never reads."""
    p.add_argument("--data_dir", default="datasets/coco_ir")
    p.add_argument("--img_feat_file", default="datasets/coco_ir/features.tsv")
    p.add_argument("--eval_model_dir", default="", help="OSCAR/VinVL checkpoint dir (backbone + vocab)")
    p.add_argument("--output_dir", default="output/")
    p.add_argument("--logger_name", default="runs/runX")
    p.add_argument("--max_seq_length", type=int, default=70)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    p.add_argument("--img_feature_dim", type=int, default=2054)
    p.add_argument("--img_feature_type", default="frcnn")
    p.add_argument("--use_img_layernorm", type=int, default=1)
    p.add_argument("--img_layer_norm_eps", type=float, default=1e-12)
    p.add_argument("--add_od_labels", action="store_true", default=False)
    p.add_argument("--od_label_type", default="vg")
    p.add_argument("--att_mask_type", default="CLR")
    p.add_argument("--do_lower_case", action="store_true", default=True)
    p.add_argument("--num_captions_per_img_train", type=int, default=5)
    p.add_argument("--num_captions_per_img_val", type=int, default=5)
    p.add_argument("--eval_img_keys_file", default="")
    p.add_argument("--eval_caption_index_file", default="")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=88)
    p.add_argument("--num_epochs", type=int, default=20)
    p.add_argument("--log_step", type=int, default=10)
    p.add_argument("--val_step", type=int, default=500)
    p.add_argument("--resume", default="")
    p.add_argument("--load-teacher-model", dest="load_teacher_model", default="")
    p.add_argument("--reinitialize-scheduler", dest="reinitialize_scheduler", action="store_true")
    p.add_argument("--config", default="")
    p.add_argument("--mesh_shape", default="dp=-1")
    p.add_argument("--ndcg", action="store_true", default=False,
                   help="enable NDCG@25 scoring from precomputed relevance "
                        "matrices (<data_dir>/relevances or the config's "
                        "dataset.data root); off by default like the "
                        "reference (SURVEY.md S2.6(11))")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32", "int8"],
                   help="bfloat16/float32: encoder matmul dtype. int8: "
                        "encoder stays bfloat16, alignment SCORING runs the "
                        "quantized double-rate MXU kernel (eval CLIs + "
                        "in-loop validation; R@K parity test-locked)")
    p.add_argument("--int8_encoder", action="store_true",
                   help="run the encoder's projection matmuls as W8A8 "
                        "dynamic int8 (double-rate MXU mode; eval/serving "
                        "only — cli/test, not training)")
    p.add_argument("--synthetic", action="store_true",
                   help="build a tiny on-disk synthetic dataset + random backbone (no COCO/ckpt needed)")
    p.add_argument("--profile_dir", default="",
                   help="capture a JAX profiler trace (XPlane; view in "
                        "TensorBoard's profile tab / Perfetto) of the first "
                        "--profile_steps post-compile train steps into this "
                        "directory (SURVEY.md S5.1)")
    p.add_argument("--profile_steps", type=int, default=5)
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="run K train steps per host dispatch as one on-device "
                        "lax.scan over a host-stacked batch window (identical "
                        "math; amortizes per-step dispatch latency — the "
                        "dominant cost at bs=32). log/val cadences fire at "
                        "window boundaries")


def to_data_args(ns: argparse.Namespace) -> DataArgs:
    keep = {f.name for f in dataclasses.fields(DataArgs)}
    return DataArgs(**{k: v for k, v in vars(ns).items() if k in keep})


def restore_training_settings(args: DataArgs) -> DataArgs:
    """Override flags from the OSCAR checkpoint's training_args.bin
    (ref:alad/train.py:534-550; do_lower_case, img_feature_type,
    add_od_labels, od_label_type, use_img_layernorm, img_layer_norm_eps)."""
    bin_path = os.path.join(args.eval_model_dir, "training_args.bin")
    if not (args.eval_model_dir and os.path.exists(bin_path)):
        return args
    import torch

    train_args = torch.load(bin_path, map_location="cpu", weights_only=False)
    for param in ("do_lower_case", "img_feature_type", "add_od_labels",
                  "od_label_type", "use_img_layernorm", "img_layer_norm_eps"):
        if hasattr(train_args, param):
            setattr(args, param, getattr(train_args, param))
    return args


def build_model_and_params(
    cfg: ExperimentConfig, args: DataArgs, example_batch, rng=None
) -> Tuple[ALADIN, dict, BertImgConfig]:
    """Model + params: heads randomly initialized, backbone grafted from the
    OSCAR checkpoint dir when given (ref:alad/alad_model.py:38-43)."""
    rng = rng if rng is not None else jax.random.PRNGKey(args.seed)
    # int8 quantizes the alignment-scoring kernel only; the encoder runs bf16
    dtype = jnp.float32 if args.compute_dtype == "float32" else jnp.bfloat16
    quant = bool(getattr(args, "int8_encoder", False))

    if args.eval_model_dir and os.path.isdir(args.eval_model_dir):
        from aladin_tpu.io.convert import load_oscar_checkpoint

        tree, bert_cfg = load_oscar_checkpoint(args.eval_model_dir)
        # hidden-act: the checkpoint json's value wins unless the YAML
        # explicitly opts into the fast tanh variant ('gelu' is both the
        # config default and a possible explicit choice, so it cannot
        # override a checkpoint that declares gelu_new — warn when they
        # disagree so the precedence is visible at runtime).
        act = (cfg.model.hidden_act if cfg.model.hidden_act != "gelu"
               else bert_cfg.hidden_act)
        if act != cfg.model.hidden_act:
            import logging

            logging.getLogger("vlpretrain").warning(
                "hidden-act: checkpoint declares %r, config has %r; "
                "following the checkpoint (set model.hidden-act: gelu-tanh "
                "explicitly to override)", bert_cfg.hidden_act,
                cfg.model.hidden_act,
            )
        if quant or act != bert_cfg.hidden_act:
            import dataclasses as _dc

            bert_cfg = _dc.replace(bert_cfg, quant_matmuls=quant, hidden_act=act)
        if cfg.model.embed_size != bert_cfg.hidden_size:
            # the reference's projection layers are dead code, so embed-size
            # MUST track the backbone; follow the checkpoint and warn
            import logging

            logging.getLogger("vlpretrain").warning(
                "embed-size %d != checkpoint hidden %d; using the checkpoint's",
                cfg.model.embed_size, bert_cfg.hidden_size,
            )
            d = cfg.to_dict()
            d["model"]["embed-size"] = bert_cfg.hidden_size
            cfg = ExperimentConfig.from_dict(d)
        model = ALADIN(cfg, bert_cfg, dtype=dtype)
        params = model.init(rng, example_batch, True)["params"]
        params["oscar"] = jax.tree.map(jnp.asarray, tree["oscar"])
    else:
        bert_cfg = BertImgConfig(img_feature_dim=args.img_feature_dim,
                                 quant_matmuls=quant,
                                 hidden_act=cfg.model.hidden_act)
        if args.synthetic:  # tiny backbone for smoke runs
            bert_cfg = BertImgConfig(
                vocab_size=512, hidden_size=cfg.model.embed_size,
                num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=2 * cfg.model.embed_size,
                max_position_embeddings=128, img_feature_dim=args.img_feature_dim,
                quant_matmuls=quant, hidden_act=cfg.model.hidden_act,
            )
        model = ALADIN(cfg, bert_cfg, dtype=dtype)
        params = model.init(rng, example_batch, True)["params"]
    return model, params, bert_cfg


def build_tokenizer(args: DataArgs):
    if args.eval_model_dir and os.path.isdir(args.eval_model_dir):
        return BertWordPieceTokenizer.from_pretrained(
            args.eval_model_dir, do_lower_case=args.do_lower_case
        )
    # synthetic fallback vocab — materialized to a temp file so the C++
    # WordPiece fast path engages in synthetic runs too
    base = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words = ["a", "photo", "of", "the", "dog", "cat", "car", "tree", "person",
             "boat", "bird", "house", "number"] + [str(i) for i in range(10)]
    vocab = {t: i for i, t in enumerate(base + words)}
    import tempfile

    f = tempfile.NamedTemporaryFile("w", suffix=".vocab.txt", delete=False)
    f.write("\n".join(base + words) + "\n")
    f.close()
    tok = BertWordPieceTokenizer(vocab, do_lower_case=True, vocab_file=f.name)
    os.unlink(f.name)  # the C++ side reads the whole file at create
    return tok


def build_loaders(tokenizer, args: DataArgs, cfg: ExperimentConfig,
                  train_split="train", val_split="minival"):
    bs = cfg.training.bs
    train_ds = RetrievalDataset(tokenizer, args, train_split, is_train=True)
    # NOTE: reference builds the val set with is_train=True (S2.6(10))
    val_ds = RetrievalDataset(tokenizer, args, val_split, is_train=True)
    train_loader = BatchLoader(train_ds, bs, shuffle=True, seed=args.seed,
                               num_threads=args.num_workers)
    val_loader = BatchLoader(val_ds, bs, shuffle=False, drop_last=False,
                             num_threads=args.num_workers)
    return train_loader, val_loader


def prepare_synthetic(args: DataArgs, n_images: int = 8) -> DataArgs:
    root = os.path.join(args.output_dir, "synthetic_coco_ir")
    make_synthetic_dataset(root, n_images=n_images, feat_dim=args.img_feature_dim)
    args.data_dir = root
    args.img_feat_file = os.path.join(root, "features.tsv")
    args.add_od_labels = True
    return args


def example_batch_from_loader(loader):
    return next(iter(loader.epoch(0)))


def build_ndcg_scorer(cfg: ExperimentConfig, args: DataArgs, split: str, n_queries: int):
    """DCG scorer over whichever relevance matrices exist on disk, else None.

    Looks in <data_dir>/relevances first, then the config's dataset.data root
    (the reference layout, ref:alad/evaluate_utils/dcg.py:11-17). Methods are
    reported in (rougeL, spice) order (ref:alad/evaluation.py:225-228)."""
    from aladin_tpu.eval.dcg import DCG

    candidates = [
        os.path.join(args.data_dir, "relevances"),
        os.path.join(cfg.dataset.data, cfg.dataset.name, "relevances"),
    ]
    for rel_dir in candidates:
        methods = [
            m for m in ("rougeL", "spice")
            if os.path.exists(os.path.join(rel_dir, f"{cfg.dataset.name}-{split}-{m}.npy"))
        ]
        if methods:
            return DCG(cfg, n_queries, split, relevance_methods=methods, rel_dir=rel_dir)
    return None


def maybe_create_mesh(args: DataArgs):
    """--mesh_shape -> Mesh when more than one device is visible, else None.

    The reference reaches multi-device only through torch DataParallel/DDP in
    the legacy OSCAR drivers (ref:oscar/run_retrieval.py:348-349); here the
    mesh is first-class in the ALADIN train/test CLIs.
    """
    from aladin_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) <= 1:
        return None
    mesh = create_mesh(args.mesh_shape)
    return mesh if mesh.size > 1 else None


def shard_state_and_loaders(state, mesh, cfg: ExperimentConfig, *loaders):
    """Place params per the tp/dp rules, replicate opt state, and point the
    loaders' transfers at the dp batch sharding. Returns the sharded state."""
    from aladin_tpu.parallel.sharding import batch_sharding, param_shardings, replicated

    dp = mesh.shape.get("dp", mesh.size)
    assert cfg.training.bs % dp == 0, (
        f"batch size {cfg.training.bs} must be divisible by dp={dp}"
    )
    state = state.replace(
        params=jax.tree.map(jax.device_put, state.params, param_shardings(state.params, mesh)),
        opt_state=jax.tree.map(
            lambda x: jax.device_put(x, replicated(mesh)), state.opt_state
        ),
    )
    sharding = batch_sharding(mesh)
    for loader in loaders:
        if loader is not None:
            loader.sharding = sharding
    return state


def setup_dp_mesh(mesh_shape: str, batch_size: int, params, opt_state, logger=None):
    """dp-mesh placement for the legacy task drivers: replicate params and
    optimizer state over the mesh and return a ``put`` that shards batch
    arrays over the dp axis — the TPU equivalent of the reference's torch
    DataParallel/DDP wrap (ref:oscar/run_captioning.py:412-415,
    run_vqa.py:507-509, run_retrieval.py:348-349). XLA emits the gradient
    all-reduce inside the jitted step; no explicit collectives.

    Single device (or dp=1): identity placement, ``put = jnp.asarray``.
    Batches whose leading dim does not divide dp (tail batches of odd-sized
    fixtures) fall back to unsharded placement rather than crashing.
    Returns (params, opt_state, put).
    """
    if len(jax.devices()) > 1:
        from aladin_tpu.parallel.mesh import create_mesh
        from aladin_tpu.parallel.sharding import batch_sharding, replicated

        mesh = create_mesh(mesh_shape)
        if mesh.size > 1:
            dp = mesh.shape.get("dp", mesh.size)
            if batch_size % dp != 0:
                # fall back to unsharded rather than crash: the default
                # mesh_shape dp=-1 auto-engages on any multi-device host
                if logger is not None:
                    logger.warning(
                        f"train batch size {batch_size} not divisible by "
                        f"dp={dp}; running unsharded (pass --mesh_shape dp=1 "
                        "to silence, or a divisible batch size to shard)"
                    )
                return params, opt_state, jnp.asarray
            params = jax.device_put(params, replicated(mesh))
            opt_state = jax.device_put(opt_state, replicated(mesh))
            sharding = batch_sharding(mesh)
            if logger is not None:
                logger.info(f"mesh: {dict(mesh.shape)}")

            def put(x):
                x = np.asarray(x)
                if x.ndim and x.shape[0] % dp == 0:
                    return jax.device_put(x, sharding)
                return jnp.asarray(x)

            return params, opt_state, put
    return params, opt_state, jnp.asarray


def add_hidden_act_flag(p) -> None:
    """--hidden_act for drivers that build a BertImgConfig directly
    (the flagship trainer reads model.hidden-act from the YAML instead)."""
    p.add_argument(
        "--hidden_act", default="gelu", choices=["gelu", "gelu_tanh"],
        help="backbone FFN activation; gelu_tanh = the TPU-fast tanh "
             "approximation (~10-15%% faster steps at B=128; not "
             "bit-compatible with erf-trained checkpoints)",
    )

"""OSCAR+ pretraining CLI - the ``oscar/run_oscarplus_pretrain.py`` equivalent.

Reference capability (ref:oscar/run_oscarplus_pretrain.py:41-549): multi-
corpus MLM + contrastive sequence-relation pretraining with AdamW (no decay
on bias/LayerNorm), WarmupLinearSchedule over max_iters, optional grad-norm
clip, checkpoint every ckpt_period, DDP + metric all_reduce. TPU-native:
one jitted step over the (dp) mesh (XLA emits the gradient all-reduce the
reference gets from DDP buckets), buffered metric fetches, orbax
checkpoints, `all_reduce_metrics` for multi-controller launches.

Smoke mode: ``--synthetic`` builds a 2-dataset corpus fixture on disk.

  python -m aladin_tpu.cli.pretrain --synthetic --max_iters 20
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aladin_tpu.cli.common import add_hidden_act_flag
from aladin_tpu.models.bert_img import BertImgConfig
from aladin_tpu.parallel import distributed
from aladin_tpu.tasks.pretrain_data import PretrainCorpus, make_synthetic_pretrain_corpus
from aladin_tpu.tasks.pretraining import BertImgForPreTraining, make_pretrain_step
from aladin_tpu.utils.logging import setup_logger
from aladin_tpu.utils.rng import make_training_key


def warmup_linear_schedule(lr: float, warmup_steps: int, t_total: int):
    """pytorch_transformers WarmupLinearSchedule: linear 0->lr over warmup,
    then linear lr->0 at t_total (ref:run_oscarplus_pretrain.py:302-304)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0, (t_total - step) / jnp.maximum(1.0, t_total - warmup_steps)
        )
        return lr * jnp.where(step < warmup_steps, warm, decay)

    return fn


def make_optimizer(lr: float, warmup_steps: int, t_total: int,
                   weight_decay: float = 0.01, adam_epsilon: float = 1e-8,
                   max_grad_norm: float = -1.0):
    """AdamW with the reference's no-decay split: biases and LayerNorm
    weights get weight_decay 0 (ref:run_oscarplus_pretrain.py:290-299)."""

    def decay_mask(params):
        def mask(path, _):
            keys = [str(getattr(k, "key", k)) for k in path]
            leaf = keys[-1] if keys else ""
            # module names are e.g. embeddings_layernorm / attention_layernorm
            in_ln = any("layernorm" in k.lower().replace("_", "") for k in keys)
            return not (leaf == "bias" or in_ln)

        return jax.tree_util.tree_map_with_path(mask, params)

    sched = warmup_linear_schedule(lr, warmup_steps, t_total)
    tx = optax.adamw(sched, eps=adam_epsilon, weight_decay=weight_decay,
                     mask=decay_mask)
    if max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx, sched


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="OSCAR+ pretraining on TPU")
    p.add_argument("--pretrain_root", default="datasets/pretrain")
    p.add_argument("--datasets", default="coco,flickr30k",
                   help="comma-joined corpus subsets (ref corpus naming)")
    p.add_argument("--eval_model_dir", default="", help="vocab source (checkpoint dir)")
    p.add_argument("--output_dir", default="output/pretrain")
    p.add_argument("--max_seq_length", type=int, default=35)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    p.add_argument("--img_feature_dim", type=int, default=2054)
    add_hidden_act_flag(p)
    p.add_argument("--train_batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=-1.0)
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--max_iters", type=int, default=100)
    p.add_argument("--ckpt_period", type=int, default=10000)
    p.add_argument("--log_step", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--use_b", type=int, default=1)
    p.add_argument("--texta_false_prob", type=float, default=0.0)
    p.add_argument("--num_contrast_classes", type=int, default=2)
    p.add_argument("--mask_loss_for_unmatched", type=int, default=1)
    p.add_argument("--mesh_shape", default="dp=-1")
    p.add_argument("--synthetic", action="store_true")
    ns = p.parse_args(argv)
    # multi-host bring-up BEFORE first jax use (env-detected; no-op on one
    # host) — the reference's init_process_group slot
    # (ref:run_oscarplus_pretrain.py:168-178)
    distributed.initialize()
    logger = setup_logger("vlpretrain", ns.output_dir)

    if ns.synthetic:
        ns.pretrain_root = os.path.join(ns.output_dir, "synthetic_pretrain")
        make_synthetic_pretrain_corpus(
            ns.pretrain_root, ns.datasets.split(","), feat_dim=ns.img_feature_dim
        )

    if ns.eval_model_dir:
        from aladin_tpu.data.tokenizer import BertWordPieceTokenizer

        tokenizer = BertWordPieceTokenizer.from_pretrained(ns.eval_model_dir)
    else:
        from aladin_tpu.cli.common import build_tokenizer
        from aladin_tpu.config import DataArgs

        tokenizer = build_tokenizer(DataArgs())

    corpus = PretrainCorpus(
        ns.pretrain_root, tokenizer, ns.datasets.split(","),
        seq_len=ns.max_seq_length, max_img_seq_length=ns.max_img_seq_length,
        img_feature_dim=ns.img_feature_dim, use_b=bool(ns.use_b),
        texta_false_prob=ns.texta_false_prob,
        num_contrast_classes=ns.num_contrast_classes,
        mask_loss_for_unmatched=bool(ns.mask_loss_for_unmatched), seed=ns.seed,
    )
    logger.info(f"corpus: {len(corpus)} examples from {ns.datasets}")

    if ns.synthetic:
        cfg = BertImgConfig(hidden_act=ns.hidden_act, 
            vocab_size=tokenizer.vocab_size, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=128, img_feature_dim=ns.img_feature_dim,
        )
    else:
        cfg = BertImgConfig(hidden_act=ns.hidden_act, vocab_size=tokenizer.vocab_size,
                            img_feature_dim=ns.img_feature_dim)
    model = BertImgForPreTraining(cfg, num_contrast_classes=ns.num_contrast_classes)

    rng = np.random.RandomState(ns.seed)
    batch0 = corpus.collate(rng.randint(len(corpus), size=ns.train_batch_size))
    params = model.init(
        jax.random.PRNGKey(ns.seed), batch0["input_ids"], batch0["attention_mask"],
        batch0["token_type_ids"], batch0["img_feats"],
    )["params"]
    tx, sched = make_optimizer(ns.learning_rate, ns.warmup_steps, ns.max_iters,
                               adam_epsilon=ns.adam_epsilon,
                               max_grad_norm=ns.max_grad_norm)
    opt_state = tx.init(params)

    # dp mesh placement: replicate params/opt, shard batches (SURVEY.md S2.5)
    from aladin_tpu.cli.common import setup_dp_mesh

    params, opt_state, put = setup_dp_mesh(
        ns.mesh_shape, ns.train_batch_size, params, opt_state, logger)

    step_fn = make_pretrain_step(model, tx)
    # main-process-only TB writer with smoothed windows, the reference's
    # pretrain observability (ref:oscar/run_oscarplus_pretrain.py +
    # oscar/utils/metric_logger.py:115-185)
    tb = None
    if distributed.is_main_process():
        from aladin_tpu.utils.metric_logger import TensorboardLogger

        tb = TensorboardLogger(os.path.join(ns.output_dir, "tb"))
    key = make_training_key(ns.seed)  # rbg on TPU (utils/rng.py)
    pending, t0 = [], time.time()
    for it in range(ns.max_iters):
        idx = rng.randint(len(corpus), size=ns.train_batch_size)
        b = corpus.collate(idx, epoch=it)
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(
            params, opt_state, put(b["input_ids"]), put(b["attention_mask"]),
            put(b["token_type_ids"]), put(b["img_feats"]), put(b["lm_labels"]),
            put(b["is_next"]), sub,
        )
        pending.append((it, metrics))
        if (it + 1) % ns.log_step == 0 or it + 1 == ns.max_iters:
            fetched = jax.device_get([m for _, m in pending])  # one sync/window
            dt = (time.time() - t0) / len(pending)
            # multi-controller parity: reduce host-local means across processes
            agg = distributed.all_reduce_metrics(
                {k: float(np.mean([m[k] for m in fetched])) for k in fetched[0]}
            )
            logger.info(
                f"iter {it + 1}/{ns.max_iters} "
                + " ".join(f"{k} {v:.4f}" for k, v in sorted(agg.items()))
                + f" lr {float(sched(it)):.2e} {dt * 1000:.0f} ms/it"
            )
            if tb is not None:
                tb.iteration = it + 1
                tb.update(lr=float(sched(it)), batch_time=dt, **agg)
            pending, t0 = [], time.time()
        if (it + 1) % ns.ckpt_period == 0 or it + 1 == ns.max_iters:
            # gather on ALL processes (collective when params are sharded
            # across hosts - rank-0-only device_get would raise on
            # non-addressable shards, ADVICE r2 #2), then write on rank 0
            # only: on a shared output_dir, concurrent rmtree+save from N
            # hosts would corrupt the checkpoint (reference saves on rank 0,
            # ref:run_oscarplus_pretrain.py)
            from aladin_tpu.io.checkpoint import _to_host

            host_params = _to_host(params)
            if distributed.is_main_process():
                import orbax.checkpoint as ocp

                path = os.path.abspath(
                    os.path.join(ns.output_dir, f"ckpt_{it + 1:07d}"))
                if os.path.exists(path):
                    import shutil

                    shutil.rmtree(path)
                ocp.PyTreeCheckpointer().save(
                    path, {"params": host_params, "iteration": it + 1}
                )
                logger.info(f"saved {path}")
            distributed.barrier("pretrain_ckpt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

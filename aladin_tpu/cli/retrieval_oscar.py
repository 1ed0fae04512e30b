"""Legacy OSCAR retrieval driver - the ``oscar/run_retrieval.py`` equivalent.

Reference capability (ref:oscar/run_retrieval.py:316-664): train the joint
(caption, image) pair classifier with in-dataset random negative sampling,
then evaluate by scoring the full N x N pair product (cross_image_eval) and
computing ranks from the matched-pair probabilities. This is the entangled
baseline ALADIN distills from - quadratic at retrieval time, which is the
paper's motivation for the disentangled heads.

  python -m aladin_tpu.cli.retrieval_oscar --synthetic --epochs 6
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from aladin_tpu.cli.common import build_tokenizer, prepare_synthetic, to_data_args, add_hidden_act_flag
from aladin_tpu.cli.pretrain import make_optimizer
from aladin_tpu.data.dataset import RetrievalDataset
from aladin_tpu.models.bert_img import BertImgConfig, ImageBertClassifier
from aladin_tpu.tasks.retrieval_oscar import evaluate_cross, make_pair_train_step, sample_pairs
from aladin_tpu.utils.logging import setup_logger
from aladin_tpu.utils.rng import make_training_key


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="OSCAR pair-retrieval on TPU")
    p.add_argument("--data_dir", default="datasets/coco_ir")
    p.add_argument("--img_feat_file", default="")
    p.add_argument("--eval_model_dir", default="")
    p.add_argument("--output_dir", default="output/retrieval_oscar")
    p.add_argument("--max_seq_length", type=int, default=70)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    p.add_argument("--img_feature_dim", type=int, default=2054)
    add_hidden_act_flag(p)
    p.add_argument("--train_batch_size", type=int, default=16,
                   help="anchor count; each anchor adds a positive + a negative")
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--loss_type", choices=("ce", "bce"), default="ce")
    p.add_argument("--eval_chunk", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mesh_shape", default="dp=-1",
                   help="dp mesh for data-parallel training (the reference's "
                        "DataParallel wrap, ref:run_retrieval.py:348-349)")
    p.add_argument("--synthetic", action="store_true")
    ns = p.parse_args(argv)
    logger = setup_logger("vlpretrain", ns.output_dir)

    # reuse the retrieval DataArgs plumbing for files/tensorizer settings
    from aladin_tpu.config import DataArgs

    args = DataArgs(
        data_dir=ns.data_dir,
        img_feat_file=ns.img_feat_file or os.path.join(ns.data_dir, "features.tsv"),
        eval_model_dir=ns.eval_model_dir, output_dir=ns.output_dir,
        max_seq_length=ns.max_seq_length, max_img_seq_length=ns.max_img_seq_length,
        img_feature_dim=ns.img_feature_dim, add_od_labels=True,
        synthetic=ns.synthetic, seed=ns.seed,
    )
    if ns.synthetic:
        args = prepare_synthetic(args)
    tokenizer = build_tokenizer(args)
    train_ds = RetrievalDataset(tokenizer, args, "train", is_train=True)
    test_ds = RetrievalDataset(tokenizer, args, "test", is_train=False)
    logger.info(f"train pairs/epoch: {2 * len(train_ds)}  test images: {len(test_ds.img_keys)}")

    if ns.synthetic:
        cfg = BertImgConfig(hidden_act=ns.hidden_act, vocab_size=tokenizer.vocab_size, hidden_size=64,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=128, max_position_embeddings=256,
                            img_feature_dim=ns.img_feature_dim, num_labels=2)
    else:
        cfg = BertImgConfig(hidden_act=ns.hidden_act, vocab_size=tokenizer.vocab_size,
                            img_feature_dim=ns.img_feature_dim, num_labels=2)
    model = ImageBertClassifier(cfg)

    rng = np.random.RandomState(ns.seed)
    bs = min(ns.train_batch_size, len(train_ds))
    b0 = sample_pairs(train_ds, list(range(bs)), rng)
    params = model.init(jax.random.PRNGKey(ns.seed), *b0[:4])["params"]
    steps_per_epoch = max(len(train_ds) // bs, 1)
    tx, _ = make_optimizer(ns.learning_rate, ns.warmup_steps,
                           ns.epochs * steps_per_epoch)
    opt_state = tx.init(params)
    step = make_pair_train_step(model, tx, ns.loss_type)
    from aladin_tpu.cli.common import setup_dp_mesh

    # each anchor contributes a positive and a negative pair -> 2*bs rows
    params, opt_state, put = setup_dp_mesh(ns.mesh_shape, 2 * bs, params,
                                           opt_state, logger)

    key = make_training_key(ns.seed)  # rbg on TPU (utils/rng.py)
    for epoch in range(ns.epochs):
        t0, metrics = time.time(), []
        order = rng.permutation(len(train_ds))
        for i in range(steps_per_epoch):
            batch = sample_pairs(train_ds, order[i * bs : (i + 1) * bs], rng)
            key, sub = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, *map(put, batch), sub)
            metrics.append(m)
        vals = jax.device_get(metrics)
        logger.info(
            f"epoch {epoch} loss {np.mean([m['loss'] for m in vals]):.4f} "
            f"pair-acc {np.mean([m['acc'] for m in vals]):.3f} ({time.time() - t0:.1f}s)"
        )

    logger.info("cross_image_eval (N x N pair scoring)...")
    res = evaluate_cross(model, params, test_ds, chunk=ns.eval_chunk)
    logger.info("retrieval: " + " ".join(f"{k} {v:.2f}" for k, v in res.items()))
    os.makedirs(ns.output_dir, exist_ok=True)
    with open(os.path.join(ns.output_dir, "eval_results.json"), "w") as f:
        json.dump(res, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

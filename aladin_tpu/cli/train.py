"""Training CLI - the ``alad/train.py`` equivalent.

Usage (mirrors ref:alad/train.py):

  python -m aladin_tpu.cli.train --config aladin_tpu/configs/<recipe>.yaml \
      --data_dir datasets/coco_ir --img_feat_file datasets/coco_ir/features.tsv \
      --eval_model_dir <vinvl-checkpoint-dir> --add_od_labels \
      --max_seq_length 50 --max_img_seq_length 34 --val_step 7000 \
      --logger_name runs/<exp>

Smoke mode: ``--synthetic`` builds a tiny on-disk dataset and a small random
backbone, then runs the full loop end-to-end (no downloads needed).
"""

from __future__ import annotations

import argparse

import numpy as np

from aladin_tpu.cli.common import (
    add_shared_flags,
    build_loaders,
    build_model_and_params,
    build_tokenizer,
    example_batch_from_loader,
    maybe_create_mesh,
    prepare_synthetic,
    restore_training_settings,
    shard_state_and_loaders,
    to_data_args,
)
from aladin_tpu.config import load_config
from aladin_tpu.io.checkpoint import load_teacher_params, resume_state
from aladin_tpu.train.loop import Trainer
from aladin_tpu.train.state import create_train_state
from aladin_tpu.utils.logging import setup_logger


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="ALADIN-TPU training")
    add_shared_flags(parser)
    ns = parser.parse_args(argv)
    args = to_data_args(ns)
    # multi-host bring-up BEFORE first jax use (no-op single-host; the
    # reference's init_process_group equivalent,
    # ref:oscar/run_oscarplus_pretrain.py:168-178)
    from aladin_tpu.parallel import distributed

    distributed.initialize()
    logger = setup_logger("vlpretrain", args.logger_name)

    if getattr(args, "int8_encoder", False):
        # quantization rounds are gradient-dead; the flag is eval/serving only
        parser.error("--int8_encoder is an evaluation/serving flag "
                     "(cli/test); training runs bf16")
    assert ns.config, "--config is required (see aladin_tpu/configs/)"
    cfg = load_config(ns.config)
    # batch sizes come from the experiment config (ref:alad/train.py:180-181)
    args.per_gpu_train_batch_size = cfg.training.bs
    args.per_gpu_eval_batch_size = cfg.training.bs

    if args.synthetic:
        args = prepare_synthetic(args)
    args = restore_training_settings(args)

    np.random.seed(args.seed)

    tokenizer = build_tokenizer(args)
    train_loader, val_loader = build_loaders(tokenizer, args, cfg)
    logger.info(f"train batches/epoch: {len(train_loader)}  val: {len(val_loader)}")

    example = example_batch_from_loader(train_loader)
    model, params, bert_cfg = build_model_and_params(cfg, args, example)
    state = create_train_state(cfg, params, steps_per_epoch=max(len(train_loader), 1))

    start_epoch = 0
    if args.resume:
        state, start_epoch, best = resume_state(state, args.resume)
        logger.info(f"resumed from {args.resume} at epoch {start_epoch} (best rsum {best})")
    elif args.load_teacher_model:
        state = load_teacher_params(state, args.load_teacher_model)
        logger.info(f"loaded teacher weights from {args.load_teacher_model}")

    mesh = maybe_create_mesh(args)
    if mesh is not None:
        state = shard_state_and_loaders(state, mesh, cfg, train_loader, val_loader)
        logger.info(f"mesh: {dict(mesh.shape)}")

    ndcg_scorer = None
    if args.ndcg:
        from aladin_tpu.cli.common import build_ndcg_scorer

        ndcg_scorer = build_ndcg_scorer(cfg, args, "minival", len(val_loader.dataset))
        logger.info(f"ndcg scorer: {ndcg_scorer.relevance_methods if ndcg_scorer else None}")

    trainer = Trainer(cfg, args, model, state, train_loader, val_loader,
                      mesh=mesh, ndcg_scorer=ndcg_scorer)
    if args.resume:
        trainer.best_rsum = best
    trainer.fit(start_epoch)
    logger.info(f"done; best rsum {trainer.best_rsum:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Evaluation CLI - the ``alad/test.py`` equivalent.

Loads a framework checkpoint (``--load_checkpoint <dir>``; the experiment
config is embedded, ref:alad/test.py:164-171), forces both heads to be
evaluated (ref:test.py:180-181), builds the test split (1k via
``--eval_img_keys_file test_img_keys_1k.tsv``, 5k via ``test_img_keys.tsv``,
ref:README.md:88-94), and reports matching-head + alignment-head R@K.
"""

from __future__ import annotations

import argparse

from aladin_tpu.cli.common import (
    add_shared_flags,
    build_model_and_params,
    build_tokenizer,
    example_batch_from_loader,
    maybe_create_mesh,
    prepare_synthetic,
    restore_training_settings,
    to_data_args,
)
from aladin_tpu.config import ExperimentConfig, load_config
from aladin_tpu.data.dataset import RetrievalDataset
from aladin_tpu.data.pipeline import BatchLoader
from aladin_tpu.eval.encode import encode_data
from aladin_tpu.eval.recall import compute_recall, recall_1k_5fold
from aladin_tpu.eval.retrieval import evaluate_alignment_head, fivefold_from_scores
from aladin_tpu.io.checkpoint import load_checkpoint
from aladin_tpu.train.step import make_eval_step
from aladin_tpu.utils.logging import setup_logger

import jax
import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="ALADIN-TPU evaluation")
    add_shared_flags(parser)
    parser.add_argument("--load_checkpoint", default="", help="framework checkpoint dir")
    parser.add_argument("--test_split", default="test")
    parser.add_argument("--fivefold", action="store_true",
                        help="5 x 1k-fold protocol over the 5k set")
    parser.add_argument("--bucketed_encode", action="store_true",
                        help="length-sorted, length-trimmed encode batches "
                             "(identical embeddings, far fewer padding FLOPs "
                             "on real COCO captions; a few extra compiles)")
    ns = parser.parse_args(argv)
    args = to_data_args(ns)
    # multi-host bring-up BEFORE first jax use (no-op single-host)
    from aladin_tpu.parallel import distributed

    distributed.initialize()
    logger = setup_logger("vlpretrain", args.logger_name)

    cfg_dict = None
    payload = None
    if ns.load_checkpoint:
        payload, cfg_dict = load_checkpoint(ns.load_checkpoint)
    if cfg_dict:
        cfg = ExperimentConfig.from_dict(cfg_dict)
    else:
        assert ns.config, "need --config when the checkpoint has no embedded config"
        cfg = load_config(ns.config)
    # evaluate BOTH heads regardless of the training loss (ref:test.py:180-181)
    d = cfg.to_dict()
    d["training"]["loss-type"] = "alignment-distillation"
    cfg = ExperimentConfig.from_dict(d)

    if args.synthetic:
        args = prepare_synthetic(args)
    args = restore_training_settings(args)

    tokenizer = build_tokenizer(args)
    test_ds = RetrievalDataset(tokenizer, args, ns.test_split, is_train=False)
    loader = BatchLoader(test_ds, cfg.training.bs, shuffle=False, drop_last=False,
                         sort_by_length=ns.bucketed_encode,
                         trim_multiple=16 if ns.bucketed_encode else 0)
    logger.info(f"test set: {len(test_ds.img_keys)} images / {len(test_ds)} captions")

    example = example_batch_from_loader(loader)
    model, params, _ = build_model_and_params(cfg, args, example)
    if payload is not None:
        # non-strict checked merge (ref:test.py:245 load_state_dict
        # strict=False): works for both orbax dirs and released .pth.tar
        # files; coverage is logged so a wrong checkpoint is visible
        from aladin_tpu.io.checkpoint import merge_params_report

        merged, stats = merge_params_report(
            jax.tree.map(np.asarray, params), payload["params"]["model"])
        params = jax.tree.map(jax.numpy.asarray, merged)
        logger.info(
            f"checkpoint: {stats['matched']} params loaded, "
            f"{len(stats['missing'])} missing, {len(stats['unused'])} unused")
        if stats["missing"]:
            logger.warning(f"missing from checkpoint: {stats['missing'][:8]}...")
        if stats["matched"] == 0:
            raise ValueError(f"{ns.load_checkpoint}: no parameter matched the model")

    eval_step = make_eval_step(model)
    # trimmed batches vary in width; size the buffers for the full widths
    buffer_len = max(args.max_seq_length, args.max_img_seq_length) + 1
    img_embs, cap_embs, img_lens, cap_lens = encode_data(
        eval_step, params, loader, buffer_len=buffer_len, logger=logger)
    if ns.bucketed_encode:
        # rows were visited in length order; restore dataset row order
        inv = np.argsort(loader.row_order(0), kind="stable")
        img_embs, cap_embs = img_embs[inv], cap_embs[inv]
        img_lens, cap_lens = img_lens[inv], cap_lens[inv]

    mesh = maybe_create_mesh(args)
    use_pallas = jax.default_backend() == "tpu"
    # --compute_dtype int8 switches the alignment SCORING kernel to the
    # quantized double-rate MXU path (R@K parity locked by
    # tests/test_eval.py int8 rank-parity); the encoder stays bf16.
    import jax.numpy as jnp

    scoring_dtype = jnp.int8 if ns.compute_dtype == "int8" else jnp.bfloat16
    if ns.compute_dtype == "int8":
        logger.info("alignment scoring: int8 (quantized MXU path)")

    logger.info("Matching head:")
    if ns.fivefold:
        m = recall_1k_5fold(img_embs[:, 0, :], cap_embs[:, 0, :])
    else:
        m = compute_recall(img_embs[:, 0, :], cap_embs[:, 0, :])
    logger.info(str({k: round(v, 2) for k, v in m.items()}))

    logger.info("Alignment head:")
    ndcg_scorer = None
    if args.ndcg:
        from aladin_tpu.cli.common import build_ndcg_scorer

        ndcg_scorer = build_ndcg_scorer(cfg, args, ns.test_split, len(test_ds))
        logger.info(f"ndcg scorer: {ndcg_scorer.relevance_methods if ndcg_scorer else None}")
    score_fn = None
    if mesh is not None:
        from aladin_tpu.parallel.mesh import sharded_mrsw_scores

        def score_fn(ims, caps, il, cl):
            return sharded_mrsw_scores(
                mesh, ims, caps, il, cl,
                aggregation=cfg.training.alignment_mode, use_pallas=use_pallas,
                compute_dtype=scoring_dtype,
            )

    i2t, t2i, scores = evaluate_alignment_head(
        img_embs, cap_embs, img_lens, cap_lens,
        aggregation=cfg.training.alignment_mode,
        use_pallas=use_pallas,
        compute_dtype=scoring_dtype,
        score_fn=score_fn,
        ndcg_scorer=None if ns.fivefold else ndcg_scorer,
    )
    if ns.fivefold:
        # fold the (N, 5N) matrix the same way the matching head folds its
        # embeddings (extends ref:recall_auxiliary.py:90-130 to this head)
        i2t, t2i = fivefold_from_scores(scores, ndcg_scorer=ndcg_scorer)
    rsum = i2t["r1"] + i2t["r5"] + i2t["r10"] + t2i["r1"] + t2i["r5"] + t2i["r10"]
    logger.info(
        "Alignment i2t %.1f/%.1f/%.1f (medr %.0f) t2i %.1f/%.1f/%.1f (medr %.0f) rsum %.1f "
        "ndcg_rouge %.4f ndcg_spice %.4f"
        % (i2t["r1"], i2t["r5"], i2t["r10"], i2t["medr"],
           t2i["r1"], t2i["r5"], t2i["r10"], t2i["medr"], rsum,
           i2t["ndcg_rougel"] + t2i["ndcg_rougel"],
           i2t["ndcg_spice"] + t2i["ndcg_spice"])
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Retrieval-quality convergence gates: proof the training stack can TRAIN.

Every other training test asserts weak properties (loss decreases, mesh
matches solo). These two gates assert the property the reference
demonstrated with its released checkpoints (ref:alad/train.py:388-471 and
the model zoo in ref:README.md:67-94): the full recipe drives retrieval
quality, not just the loss scalar.

1. Memorization: on a 32-image corpus whose captions uniquely identify
   their image (make_synthetic_dataset(distinguishable=True)), the flagship
   `alad-alignment-and-matching-distill` recipe must push BOTH heads to
   >= 95% of the rsum ceiling (570/600). A mis-wired gradient (e.g. a
   stop_gradient on the wrong side of the distillation term,
   ref:alad/loss.py:370) would keep the matching head at chance here while
   every loss-decreases test still passes.

2. Distillation transfer (the paper's core claim): a matching head distilled
   from a trained alignment teacher with a frozen backbone
   (`alad-matching-distill-finetune` + load_teacher_params) must beat a
   from-scratch `alad-matching-triplet-e2e` run of the SAME step budget.
   Prototype margins: 200.0 vs 125.0 rsum after 6 epochs (epochs chosen so
   the scratch run is far from converged).

Both run the real product path: config recipes from aladin_tpu/configs/,
BatchLoader, create_train_state (freeze partition live in the transfer
test), make_train_step. ~3 min CPU total; slow-marked.
"""

import os

import pytest

import jax
import jax.numpy as jnp

from aladin_tpu.config import DataArgs, ExperimentConfig, load_config
from aladin_tpu.data.dataset import RetrievalDataset, make_synthetic_dataset
from aladin_tpu.data.pipeline import BatchLoader
from aladin_tpu.cli.common import build_tokenizer, build_model_and_params
from aladin_tpu.train.state import create_train_state
from aladin_tpu.train.step import make_eval_step, make_train_step
from aladin_tpu.eval.encode import encode_data
from aladin_tpu.eval.recall import compute_recall
from aladin_tpu.eval.retrieval import evaluate_alignment_head

pytestmark = pytest.mark.slow

N_IMAGES = 32
CEILING = 600.0  # 6 recall@K terms x 100
LR = 1e-3  # scaled for the 128-dim model; the recipes' 1e-5 fits the 768-dim


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("conv_corpus"))
    make_synthetic_dataset(root, n_images=N_IMAGES, feat_dim=32, distinguishable=True)
    args = DataArgs(
        data_dir=root, img_feat_file=os.path.join(root, "features.tsv"),
        output_dir=os.path.join(root, "out"),
        logger_name=os.path.join(root, "out", "runs"),
        max_seq_length=20, max_img_seq_length=12, img_feature_dim=32,
        add_od_labels=True, num_workers=0, seed=0, synthetic=True,
    )
    return args, build_tokenizer(args)


def small_recipe(recipe: str) -> ExperimentConfig:
    cfg = load_config(f"aladin_tpu/configs/{recipe}.yaml")
    d = cfg.to_dict()
    d["model"]["embed-size"] = 128
    d["training"]["lr"] = LR
    d["training"]["bs"] = 32
    d["training"]["scheduler"] = None  # steplr's decay is tuned for 768-dim COCO
    return ExperimentConfig.from_dict(d)


def setup_run(corpus, recipe: str, seed: int = 0):
    args, tok = corpus
    cfg = small_recipe(recipe)
    loader = BatchLoader(RetrievalDataset(tok, args, "train", is_train=True),
                         cfg.training.bs, shuffle=True, seed=seed, num_threads=0)
    val_loader = BatchLoader(RetrievalDataset(tok, args, "train", is_train=True),
                             cfg.training.bs, shuffle=False, drop_last=False,
                             num_threads=0)
    example = next(iter(loader.epoch(0)))
    model, params, _ = build_model_and_params(cfg, args, example)
    return cfg, model, params, loader, val_loader


def train_epochs(cfg, model, state, loader, epochs, seed: int = 0):
    step = make_train_step(model, cfg)
    key = jax.random.PRNGKey(seed)
    for ep in range(epochs):
        for batch in loader.epoch(ep):
            state, _ = step(state, batch, jnp.int32(ep), key)
    return state


def matching_rsum(cfg, model, state, val_loader):
    eval_step = make_eval_step(model)
    img_embs, cap_embs, _, _ = encode_data(eval_step, state.params["model"], val_loader)
    return compute_recall(img_embs[:, 0, :], cap_embs[:, 0, :])["rsum"]


def test_flagship_memorizes_both_heads(corpus):
    cfg, model, params, loader, val_loader = setup_run(
        corpus, "alad-alignment-and-matching-distill")
    state = create_train_state(cfg, params, steps_per_epoch=max(len(loader), 1))
    step = make_train_step(model, cfg)
    eval_step = make_eval_step(model)
    key = jax.random.PRNGKey(0)

    m_rsum = a_rsum = 0.0
    for ep in range(40):
        for batch in loader.epoch(ep):
            state, _ = step(state, batch, jnp.int32(ep), key)
        # evaluate every 5 epochs once plausibly converged; early-exit on pass
        if ep >= 19 and (ep + 1) % 5 == 0:
            img_embs, cap_embs, img_lens, cap_lens = encode_data(
                eval_step, state.params["model"], val_loader)
            m_rsum = compute_recall(img_embs[:, 0, :], cap_embs[:, 0, :])["rsum"]
            i2t, t2i, _ = evaluate_alignment_head(
                img_embs, cap_embs, img_lens, cap_lens,
                aggregation=cfg.training.alignment_mode, use_pallas=False,
                compute_dtype=jnp.float32)
            a_rsum = sum(i2t[k] + t2i[k] for k in ("r1", "r5", "r10"))
            if m_rsum >= 0.95 * CEILING and a_rsum >= 0.95 * CEILING:
                break
    # prototype trajectory (lr 1e-3): alignment 596.9 by ep 10, matching
    # 582.5 by ep 30, 600/600 by ep 50 at lr 5e-4
    assert a_rsum >= 0.95 * CEILING, f"alignment head failed to memorize: {a_rsum}"
    assert m_rsum >= 0.95 * CEILING, f"matching head failed to memorize: {m_rsum}"


def test_distillation_transfer_beats_scratch(corpus):
    # 1) alignment-only teacher, trainable backbone (recipe 1)
    cfg_t, model_t, params_t, loader_t, val_t = setup_run(
        corpus, "alad-alignment-triplet")
    state_t = create_train_state(cfg_t, params_t, steps_per_epoch=max(len(loader_t), 1))
    state_t = train_epochs(cfg_t, model_t, state_t, loader_t, epochs=12)

    # 2) student: frozen teacher backbone, matching head via listnet score
    #    distillation (recipe 3 + --load-teacher-model semantics)
    cfg_d, model_d, _, loader_d, val_d = setup_run(
        corpus, "alad-matching-distill-finetune", seed=1)
    state_d = create_train_state(cfg_d, state_t.params["model"],
                                 steps_per_epoch=max(len(loader_d), 1))
    frozen_before = jax.device_get(state_d.params["model"]["oscar"])
    state_d = train_epochs(cfg_d, model_d, state_d, loader_d, epochs=6, seed=1)
    distill_rsum = matching_rsum(cfg_d, model_d, state_d, val_d)

    # freeze-teran partition actually held during the distill run
    frozen_after = jax.device_get(state_d.params["model"]["oscar"])
    chex = jax.tree.map(lambda a, b: bool((a == b).all()), frozen_before, frozen_after)
    assert all(jax.tree.leaves(chex)), "frozen backbone moved during distillation"

    # 3) from-scratch matching head, same budget (recipe 4)
    cfg_s, model_s, params_s, loader_s, val_s = setup_run(
        corpus, "alad-matching-triplet-e2e", seed=1)
    state_s = create_train_state(cfg_s, params_s, steps_per_epoch=max(len(loader_s), 1))
    state_s = train_epochs(cfg_s, model_s, state_s, loader_s, epochs=6, seed=1)
    scratch_rsum = matching_rsum(cfg_s, model_s, state_s, val_s)

    # prototype margins: 200.0 vs 125.0 — require a real gap, not a tie-break
    assert distill_rsum > scratch_rsum + 20.0, (
        f"distillation transfer failed: distilled {distill_rsum} vs "
        f"scratch {scratch_rsum}")

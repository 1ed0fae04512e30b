"""Train state: parameters (model + auxiliary loss params), optimizer, step.

Optimizer contract (ref:alad/train.py:255-274): plain Adam (torch defaults:
b1=0.9, b2=0.999, eps=1e-8, no weight decay) over ALL parameters, global-norm
gradient clip (grad-clip: 2.0 applied outside the optimizer in the reference,
ref:train.py:421-422).

freeze-teran (ref:alad/alad_model.py:122-123 torch.set_grad_enabled): the
backbone, the TERAN per-modality stacks, and the alignment-side depth
aggregation are trained with zero updates (optax.multi_transform mask); the
matching head, matching-side depth aggregation, and post-OSCAR TE stay live -
the exact partition the reference's grad-enabled regions induce
(ref:alad_model.py:121-228).

Auxiliary learnables owned here (the reference scatters them across Modules):
  * auto loss weights s_k, init -2.3 (ref:alad_model.py:272). NOTE the
    reference's are plain-dict Parameters that never reach the optimizer and
    therefore stay constant (SURVEY.md S2.6 follow-on); ours actually learn.
  * the mse-distillation affine wb, init [0.5, 0.5] (ref:alad/loss.py:367).
(The InfoNCE log-temperature, ref:alad/loss.py:193, is an ARGUMENT of
ops/losses.info_nce_loss, not an aux param — the loss is library-only, as
in the reference, whose CrossEntropyCriterion no shipped config uses.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from aladin_tpu.config import ExperimentConfig
from aladin_tpu.train.schedule import make_lr_schedule

FROZEN_WITH_TERAN = (
    "oscar",
    "transformer_encoder_1",
    "transformer_encoder_2",
    "depth_aggregator_alignment",
    "feature_fusion",
)


@flax.struct.dataclass
class TrainState:
    params: Any  # {"model": ..., "aux": {...}}
    opt_state: Any
    step: jax.Array  # Eiters (ref:alad_model.py:434)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            step=self.step + 1,
        )


def make_aux_params(cfg: ExperimentConfig) -> Dict[str, Any]:
    aux: Dict[str, Any] = {}
    tc = cfg.training
    if tc.auto_weight:
        aux["loss_weights"] = {k: jnp.full((1,), -2.3, jnp.float32) for k in tc.loss_types}
    if "distillation" in tc.loss_types and tc.distillation_mode == "mse":
        aux["distill_wb"] = jnp.asarray([0.5, 0.5], jnp.float32)
    aux.setdefault("_", jnp.zeros((), jnp.float32))  # keep the tree non-empty
    return aux


def make_optimizer(cfg: ExperimentConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    tc = cfg.training
    schedule = make_lr_schedule(tc, steps_per_epoch)
    core = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip) if tc.grad_clip > 0 else optax.identity(),
        optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8),
    )
    if not cfg.model.freeze_teran:
        return core

    def label(path, _):
        top = str(getattr(path[0], "key", path[0])) if path else ""
        sub = str(getattr(path[1], "key", path[1])) if len(path) > 1 else ""
        if top == "model" and sub in FROZEN_WITH_TERAN:
            return "frozen"
        return "train"

    def label_tree(params):
        return jax.tree_util.tree_map_with_path(lambda p, v: label(p, v), params)

    return optax.multi_transform(
        {"train": core, "frozen": optax.set_to_zero()}, label_tree
    )


def create_train_state(
    cfg: ExperimentConfig,
    model_params: Any,
    steps_per_epoch: int = 1000,
    aux: Optional[Dict[str, Any]] = None,
) -> TrainState:
    params = {"model": model_params, "aux": aux if aux is not None else make_aux_params(cfg)}
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        tx=tx,
    )

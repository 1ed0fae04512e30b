"""Learning-rate schedules.

Reference semantics (ref:alad/train.py:255-274,401-405):
  * StepLR over EPOCHS: lr = lr0 * gamma^(epoch // step_size); the reference
    calls scheduler.step(epoch) every iteration, which resolves to exactly
    this closed form;
  * optional linear warmup (pytorch_warmup-style dampening
    lr *= min(1, step / warmup_period)). NOTE the reference would crash on
    warmup='linear' (module never imported - defect SURVEY.md S2.6(1)); here
    it is implemented.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from aladin_tpu.config import TrainingConfig


def make_lr_schedule(tc: TrainingConfig, steps_per_epoch: int):
    """optax-compatible schedule: step index -> lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(tc.lr, jnp.float32)
        if tc.scheduler == "steplr":
            epoch = jnp.floor(step / steps_per_epoch)
            lr = lr * jnp.power(tc.gamma, jnp.floor(epoch / tc.step_size))
        elif tc.scheduler is not None:
            raise ValueError(f"unknown scheduler {tc.scheduler!r}")
        if tc.warmup == "linear":
            lr = lr * jnp.minimum(1.0, (step + 1.0) / tc.warmup_period)
        elif tc.warmup is not None:
            raise ValueError(f"unknown warmup {tc.warmup!r}")
        return lr

    return schedule

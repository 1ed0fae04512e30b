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

import jax.numpy as jnp

from aladin_tpu.config import TrainingConfig


def warmup_linear_schedule(lr: float, warmup_steps: int, total_steps: int):
    """The vendored pytorch_transformers WarmupLinearSchedule the legacy
    OSCAR tasks use (ref:oscar/run_retrieval.py:338-346): linear ramp to lr
    over warmup_steps, then linear decay to 0 at total_steps."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        decay = jnp.maximum(
            0.0, (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1)
        )
        return lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def make_adamw(lr_schedule, weight_decay: float = 0.05, eps: float = 1e-8):
    """AdamW as the legacy tasks configure it (ref:run_retrieval.py:338-343;
    LayerNorm scales and biases excluded from decay, the BERT convention)."""
    import optax

    def decay_mask(params):
        import jax as _jax

        def is_decayed(path, _):
            names = [str(getattr(k, "key", k)) for k in path]
            return not (names[-1] == "bias" or any("layernorm" in n.lower() or n in ("scale",) for n in names))

        return _jax.tree_util.tree_map_with_path(is_decayed, params)

    return optax.adamw(lr_schedule, b1=0.9, b2=0.999, eps=eps,
                       weight_decay=weight_decay, mask=decay_mask)


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

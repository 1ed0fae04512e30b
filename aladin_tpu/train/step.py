"""The jitted training step: forward, loss composition, update.

Loss composition contract (ref:alad/alad_model.py:371-454 forward_loss /
forward):
  * the matching score matrix is ALWAYS computed (the reference's
    always-truthy condition, SURVEY.md S2.6(2) - and distillation needs it);
  * the alignment head runs when 'alignment' or 'distillation' is active;
    its score matrix is the in-model teacher, gradient-stopped before
    distillation (ref:alad/loss.py:370);
  * 'selfaggregation' contributes the matching loss under its own key
    (ref:alad_model.py:397-402);
  * the distillation term is gated off while epoch < distill_epoch, unless
    it is the ONLY loss (ref:alad_model.py:442-444);
  * fixed weights: total = sum w_k L_k; auto: 0.5 * sum(L_k e^{-s_k} + s_k)
    (ref:alad_model.py:445-453) with genuinely learnable s_k.

One jitted function serves single-chip and mesh runs: under a mesh, place
the state (replicated / tp-sharded params) and the dp-sharded batch before
calling - XLA's SPMD partitioner propagates the layout and emits the
gradient all-reduce over ICI.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from aladin_tpu.config import ExperimentConfig
from aladin_tpu.models.aladin import ALADIN, Batch
from aladin_tpu.ops import losses as L
from aladin_tpu.train.state import TrainState


def encode_microbatched(model: ALADIN, params, batch: Batch, rng, microbatch: int):
    """Full-batch encoder outputs with bounded activation memory.

    The in-batch contrastive losses need the WHOLE batch's embeddings (the
    B x B score matrices), so gradient accumulation would change loss
    semantics. Instead the ENCODER runs as a lax.scan over microbatches with
    jax.checkpoint around each: only the per-microbatch token embeddings
    (B, S, D) survive the forward; the backward recomputes each microbatch's
    backbone. Peak activation memory drops ~B/microbatch-fold while the loss
    stays mathematically identical to one big forward (dropout draws differ
    per microbatch; grads match exactly at dropout 0 - tested). This is the
    single-chip lever for the B>=1024 regime the reference never reaches
    (it trains at bs=32, ref:alad/configs/*.yaml)."""
    b = batch.txt_ids.shape[0]
    assert b % microbatch == 0, (b, microbatch)
    nb = b // microbatch
    stacked = jax.tree.map(lambda x: x.reshape(nb, microbatch, *x.shape[1:]), batch)

    @jax.checkpoint
    def enc(p, mb, key):
        return model.apply({"params": p}, mb, False, rngs={"dropout": key})

    def body(i, mb):
        return i + 1, enc(params, mb, jax.random.fold_in(rng, i))

    _, outs = jax.lax.scan(body, jnp.int32(0), stacked)
    merge = lambda x: x.reshape(b, *x.shape[2:])  # noqa: E731
    return outs.replace(
        img_global=merge(outs.img_global),
        cap_global=merge(outs.cap_global),
        img_set=merge(outs.img_set),
        cap_seq=merge(outs.cap_seq),
        img_len=merge(outs.img_len),
        cap_len=merge(outs.cap_len),
        l1_reg=outs.l1_reg.mean(),
    )


def make_loss_fn(model: ALADIN, cfg: ExperimentConfig) -> Callable:
    tc = cfg.training
    types = tc.loss_types

    def loss_fn(params, batch: Batch, epoch, rng):
        mb = tc.encoder_microbatch
        if mb and batch.txt_ids.shape[0] > mb:
            out = encode_microbatched(model, params["model"], batch, rng, mb)
        else:
            out = model.apply(
                {"params": params["model"]}, batch, False, rngs={"dropout": rng}
            )
        aux = params["aux"]
        terms: Dict[str, jax.Array] = {}

        matching_loss, matching_mat = L.matching_loss(
            out.img_global, out.cap_global, tc.margin, tc.measure, tc.max_violation
        )
        if "matching" in types:
            terms["matching"] = matching_loss

        teacher = None
        if "alignment" in types or "distillation" in types:
            alignment_loss, teacher = L.alignment_contrastive_loss(
                out.img_set, out.cap_seq, out.img_len, out.cap_len,
                tc.margin, tc.max_violation, tc.alignment_mode, normalized=True,
                chunk=tc.alignment_chunk,
            )
            if "alignment" in types:
                terms["alignment"] = alignment_loss

        if "selfaggregation" in types:
            terms["selfaggregation"] = matching_loss

        if "distillation" in types:
            # margin is the DistillationLoss default 0.2, NOT the config's
            # training.margin: the reference constructs the loss without
            # passing it (ref:alad/alad_model.py:277, loss.py:361)
            terms["distillation"] = L.distillation_loss(
                jax.lax.stop_gradient(teacher), matching_mat, tc.distillation_mode,
                wb=aux.get("distill_wb"), margin=0.2,
            )

        if "entropy" in types:
            terms["entropy"] = L.entropy_uniformity_loss(out.img_global, out.cap_global)

        if "regularizehidden" in types:
            terms["regularizehidden"] = out.l1_reg

        # distillation epoch gate (only when it is not the sole loss)
        gates = {k: jnp.float32(1.0) for k in terms}
        if "distillation" in terms and len(terms) > 1:
            gates["distillation"] = (epoch >= tc.activate_distillation_after).astype(jnp.float32)

        # same weighting semantics as ops/losses.combine_losses, with the
        # epoch gate zeroing the WHOLE per-term contribution (including the
        # +s uncertainty regularizer) — which is why combine_losses is not
        # called here; change both together if the formula ever moves
        total = jnp.float32(0.0)
        for k, v in terms.items():
            if tc.auto_weight:
                s = aux["loss_weights"][k].squeeze()
                total = total + gates[k] * 0.5 * (v * jnp.exp(-s) + s)
            else:
                total = total + gates[k] * tc.weight_for(k) * v

        metrics = {f"{k}_loss": v for k, v in terms.items()}
        metrics["loss"] = total
        return total, metrics

    return loss_fn


def make_train_step(model: ALADIN, cfg: ExperimentConfig):
    """Returns jitted (state, batch, epoch, rng) -> (state, metrics)."""
    loss_fn = make_loss_fn(model, cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Batch, epoch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch, epoch, rng)
        new_state = state.apply_gradients(grads)
        metrics["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads))
        )
        return new_state, metrics

    return train_step


def make_multi_train_step(model: ALADIN, cfg: ExperimentConfig):
    """K steps per dispatch: jitted (state, batches, epoch, rng) ->
    (state, metrics stacked [K]).

    ``batches`` is a TUPLE of K per-step Batch pytrees, stacked into the
    lax.scan's window axis INSIDE the jitted program. The tuple form is
    load-bearing: the loader's prefetch thread keeps transferring batches
    one at a time, overlapped with compute, exactly as it does for single
    dispatches — a host-side stack-then-transfer would serialize one big
    blocking window transfer per dispatch and LOSE at the loop level
    (measured on chip: 154 -> 200 ms/step at K=8 with host stacking).
    The on-device stack is an HBM copy, noise next to a step.

    The body is the SAME per-step update as make_train_step (same rng fold
    on state.step, same Adam math), so a K-window is bit-identical to K
    single dispatches (test-locked) while paying ONE host dispatch per
    window instead of K — the amortization lever for the reference's own
    bs=32 regime (ref:alad/configs/*.yaml all train at bs 32), where the
    MXU finishes a 32-row step faster than the host can issue the next
    one. K is a pure runtime knob (--steps_per_dispatch); it never changes
    training semantics.
    """
    loss_fn = make_loss_fn(model, cfg)

    # the window size is encoded in the input pytree structure (a K-tuple),
    # so jit compiles one program per distinct K automatically
    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, batches, epoch, rng):
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

        def body(st, b):
            r = jax.random.fold_in(rng, st.step)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, metrics), grads = grad_fn(st.params, b, epoch, r)
            new_st = st.apply_gradients(grads)
            metrics["grad_norm"] = jnp.sqrt(
                sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads))
            )
            return new_st, metrics

        return jax.lax.scan(body, state, stacked)

    def call(state, batches, epoch, rng):
        return multi_step(state, tuple(batches), epoch, rng)

    return call


def make_eval_step(model: ALADIN):
    """Jitted deterministic forward -> AladinOutputs (encode_data's engine)."""

    @jax.jit
    def eval_step(model_params, batch: Batch):
        return model.apply({"params": model_params}, batch, True)

    return eval_step

"""Train-step tests: optimization progress, freeze partition, distill gate,
auto weights, LR schedule, and the dp x tp sharded step on the 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from aladin_tpu.config import ExperimentConfig, TrainingConfig
from aladin_tpu.models.aladin import ALADIN, Batch
from aladin_tpu.models.bert_img import BertImgConfig
from aladin_tpu.train.schedule import make_lr_schedule
from aladin_tpu.train.state import create_train_state, make_aux_params
from aladin_tpu.train.step import make_train_step

from tests.test_models import SMALL, make_batch, small_cfg


def make_model(loss_type="alignment-distillation", weights=(1, 1), **model_over):
    d = {
        "model": {"embed-size": SMALL["hidden_size"], "tern-layers": 1, **model_over},
        "training": {
            "loss-type": loss_type,
            "loss-weights": list(weights) if weights != "auto" else "auto",
            "lr": 1e-3,
            "bs": 4,
        },
    }
    cfg = ExperimentConfig.from_dict(d)
    return ALADIN(cfg, small_cfg()), cfg


def init_state(model, cfg, batch, steps_per_epoch=10):
    params = model.init(jax.random.PRNGKey(0), batch, True)["params"]
    return create_train_state(cfg, params, steps_per_epoch)


def test_loss_decreases(rng):
    model, cfg = make_model()
    batch = make_batch(rng)
    state = init_state(model, cfg, batch)
    step = make_train_step(model, cfg)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jnp.int32(0), jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


@pytest.mark.slow
def test_encoder_microbatch_matches_full(rng):
    """encoder-microbatch (checkpointed encoder scan) produces the SAME loss
    and gradients as one big forward - full-batch contrastive semantics are
    preserved, only activation memory changes. Dropout 0 so rng draws can't
    differ between the two paths."""
    from aladin_tpu.train.step import make_loss_fn

    d = {
        "model": {"embed-size": SMALL["hidden_size"], "tern-layers": 1, "dropout": 0.0},
        "training": {"loss-type": "alignment-distillation-matching",
                     "loss-weights": [1, 1, 0.5], "lr": 1e-3, "bs": 8},
    }
    cfg_full = ExperimentConfig.from_dict(d)
    d2 = {**d, "training": {**d["training"], "encoder-microbatch": 2}}
    cfg_mb = ExperimentConfig.from_dict(d2)

    import dataclasses

    bert = dataclasses.replace(small_cfg(), hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0)
    model_full = ALADIN(cfg_full, bert)
    model_mb = ALADIN(cfg_mb, bert)
    batch = make_batch(rng, b=8)
    state = init_state(model_full, cfg_full, batch)

    key = jax.random.PRNGKey(3)
    lf = jax.value_and_grad(make_loss_fn(model_full, cfg_full), has_aux=True)
    lm = jax.value_and_grad(make_loss_fn(model_mb, cfg_mb), has_aux=True)
    (loss_f, _), g_f = lf(state.params, batch, jnp.int32(0), key)
    (loss_m, _), g_m = lm(state.params, batch, jnp.int32(0), key)
    np.testing.assert_allclose(float(loss_m), float(loss_f), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_freeze_teran_partition(rng):
    model, cfg = make_model(**{"freeze-teran": True})
    batch = make_batch(rng)
    state = init_state(model, cfg, batch)
    before = jax.tree.map(np.asarray, state.params["model"])
    step = make_train_step(model, cfg)
    state, _ = step(state, batch, jnp.int32(0), jax.random.PRNGKey(1))
    after = state.params["model"]
    # backbone frozen exactly
    assert np.array_equal(
        before["oscar"]["layer_0"]["intermediate"]["kernel"],
        np.asarray(after["oscar"]["layer_0"]["intermediate"]["kernel"]),
    )
    # matching head trains
    assert not np.array_equal(
        before["final_projection_net"]["layer_0"]["linear1"]["kernel"],
        np.asarray(after["final_projection_net"]["layer_0"]["linear1"]["kernel"]),
    )


def test_distillation_epoch_gate(rng):
    model, cfg = make_model()
    object.__setattr__(cfg.training, "activate_distillation_after", 2)
    batch = make_batch(rng)
    state = init_state(model, cfg, batch)
    from aladin_tpu.train.step import make_loss_fn

    loss_fn = make_loss_fn(model, cfg)
    t0, m0 = loss_fn(state.params, batch, jnp.int32(0), jax.random.PRNGKey(0))
    t2, m2 = loss_fn(state.params, batch, jnp.int32(2), jax.random.PRNGKey(0))
    # same distillation term reported, but only epoch>=2 includes it in total
    assert abs(float(m0["distillation_loss"]) - float(m2["distillation_loss"])) < 1e-5
    assert abs(float(t2) - float(t0) - float(m0["distillation_loss"])) < 1e-4


@pytest.mark.slow
def test_auto_weights_learn(rng):
    model, cfg = make_model(weights="auto")
    batch = make_batch(rng)
    state = init_state(model, cfg, batch)
    s_before = float(state.params["aux"]["loss_weights"]["alignment"][0])
    step = make_train_step(model, cfg)
    for _ in range(3):
        state, _ = step(state, batch, jnp.int32(0), jax.random.PRNGKey(1))
    s_after = float(state.params["aux"]["loss_weights"]["alignment"][0])
    assert abs(s_before - (-2.3)) < 1e-6
    assert s_after != s_before  # genuinely learnable (reference defect fixed)


def test_lr_schedule_steplr_and_warmup():
    tc = TrainingConfig(lr=1e-2, scheduler="steplr", gamma=0.1, step_size=2,
                        warmup="linear", warmup_period=10)
    sched = make_lr_schedule(tc, steps_per_epoch=5)
    # step 0: warmup 1/10 of lr
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    # step 30 -> epoch 6 -> decayed 0.1^3, warmup done
    assert abs(float(sched(30)) - 1e-2 * 0.1**3) < 1e-12
    tc2 = TrainingConfig(lr=1e-2, scheduler=None, warmup=None)
    assert abs(float(make_lr_schedule(tc2, 5)(123)) - 1e-2) < 1e-9


def shard_batch(batch, sharding):
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


@pytest.mark.slow
def test_sharded_train_step_dp_tp(rng):
    """Full train step over a dp=4 x tp=2 mesh on 8 virtual CPU devices."""
    from aladin_tpu.parallel.mesh import create_mesh
    from aladin_tpu.parallel.sharding import batch_sharding, param_shardings

    mesh = create_mesh("dp=4,tp=2")
    model, cfg = make_model()
    batch = make_batch(rng, b=8)
    state = init_state(model, cfg, batch)

    pspec = param_shardings(state.params, mesh)
    params_sharded = jax.tree.map(jax.device_put, state.params, pspec)
    opt_sharded = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state.opt_state
    )
    state_sharded = state.replace(params=params_sharded, opt_state=opt_sharded)
    batch_s = shard_batch(batch, batch_sharding(mesh))

    step = make_train_step(model, cfg)
    # single-device reference
    state_ref, m_ref = step(init_state(model, cfg, batch), batch, jnp.int32(0), jax.random.PRNGKey(1))
    state_out, m_out = step(state_sharded, batch_s, jnp.int32(0), jax.random.PRNGKey(1))
    assert np.isfinite(float(m_out["loss"]))
    np.testing.assert_allclose(float(m_out["loss"]), float(m_ref["loss"]), rtol=1e-3)
    # tp-sharded weight actually updated and matches the unsharded update
    a = np.asarray(state_out.params["model"]["oscar"]["layer_0"]["intermediate"]["kernel"])
    b = np.asarray(state_ref.params["model"]["oscar"]["layer_0"]["intermediate"]["kernel"])
    np.testing.assert_allclose(a, b, atol=2e-4)


@pytest.mark.parametrize("loss_type,weights", [
    ("matching", (1,)),
    ("distillation", (1,)),
    ("alignment-distillation-matching", (1, 1, 0.1)),
    ("alignment-matching-entropy", (1, 1, 0.1)),
    ("alignment-regularizehidden", (1, 0.001)),
])
def test_all_recipe_loss_types_run(rng, loss_type, weights):
    model, cfg = make_model(loss_type, weights)
    batch = make_batch(rng)
    state = init_state(model, cfg, batch)
    step = make_train_step(model, cfg)
    state, metrics = step(state, batch, jnp.int32(3), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"])), loss_type


@pytest.mark.slow
def test_rbg_training_key_drives_the_step(rng):
    """The 'rbg' PRNG (the TPU production dropout key, utils/rng.py) flows
    through fold_in -> flax Dropout -> the full step: loss finite, params
    update, and two different rbg seeds give different dropout draws."""
    from aladin_tpu.utils.rng import make_training_key

    model, cfg = make_model()
    batch = make_batch(rng)
    step = make_train_step(model, cfg)  # donates state - fresh one per call
    state = init_state(model, cfg, batch)
    before = np.asarray(state.params["model"]["oscar"]["layer_0"]["intermediate"]["kernel"])
    state2, m = step(state, batch, jnp.int32(0), make_training_key(0, "rbg"))
    assert np.isfinite(float(m["loss"]))
    after = np.asarray(state2.params["model"]["oscar"]["layer_0"]["intermediate"]["kernel"])
    assert not np.allclose(before, after)
    # different seed -> different dropout mask -> different loss
    _, m2 = step(init_state(model, cfg, batch), batch, jnp.int32(0),
                 make_training_key(7, "rbg"))
    assert float(m["loss"]) != float(m2["loss"])


def test_training_key_impl_selection():
    from aladin_tpu.utils.rng import make_training_key

    # threefry = the legacy key, bitwise-identical to PRNGKey (locks the
    # draw sequences every existing parity test depends on)
    np.testing.assert_array_equal(
        np.asarray(make_training_key(42, "threefry")),
        np.asarray(jax.random.PRNGKey(42)),
    )
    # auto on CPU resolves to threefry (tests stay bitwise-reproducible)
    np.testing.assert_array_equal(
        np.asarray(make_training_key(42, "auto")), np.asarray(jax.random.PRNGKey(42))
    )
    with pytest.raises(ValueError):
        make_training_key(0, "philox")
    # the knob round-trips through the config dict (checkpoint-embedded)
    cfg = ExperimentConfig.from_dict({"training": {"rng-impl": "threefry"}})
    assert cfg.training.rng_impl == "threefry"
    assert ExperimentConfig.from_dict(cfg.to_dict()).training.rng_impl == "threefry"


def test_multi_step_dispatch_matches_single(rng):
    """make_multi_train_step: one K=4 on-device scan window is BIT-IDENTICAL
    to 4 single dispatches — same per-step rng fold on state.step, same Adam
    math. This is what makes --steps_per_dispatch a pure runtime knob."""
    from aladin_tpu.train.step import make_multi_train_step

    model, cfg = make_model()
    batches = [make_batch(np.random.RandomState(s)) for s in range(4)]
    key = jax.random.PRNGKey(3)

    state_a = init_state(model, cfg, batches[0])
    step = make_train_step(model, cfg)
    singles = []
    for b in batches:
        state_a, m = step(state_a, b, jnp.int32(0), key)
        singles.append(float(m["loss"]))

    state_b = init_state(model, cfg, batches[0])
    multi = make_multi_train_step(model, cfg)
    state_b, mk = multi(state_b, batches, jnp.int32(0), key)

    assert int(state_b.step) == 4
    np.testing.assert_array_equal(np.asarray(mk["loss"]), np.asarray(singles))
    for pa, pb in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

"""Where does the B=128 train step's non-MFU time go? (throwaway ablation)"""
import time
import jax, jax.numpy as jnp
from aladin_tpu.config import ExperimentConfig
from aladin_tpu.models.aladin import ALADIN
from aladin_tpu.models.bert_img import BertImgConfig
from aladin_tpu.train.state import create_train_state
from aladin_tpu.train.step import make_train_step, make_loss_fn
from aladin_tpu.utils.profiling import train_step_model_flops, V5E_BF16_PEAK
from aladin_tpu.utils.rng import make_training_key
from benchmarks.retrieval_eval_bench import synth_batch

B = 128
cfg = ExperimentConfig.from_dict({"model": {"embed-size": 768, "tern-layers": 2},
    "training": {"loss-type": "alignment-distillation", "loss-weights": [1, 1],
                 "lr": 1e-5, "bs": B}})
bc = BertImgConfig()
model = ALADIN(cfg, bc, dtype=jnp.bfloat16)
batch = synth_batch(jax.random.PRNGKey(0), B, 50, 34, bc.img_feature_dim, bc.vocab_size)
key = make_training_key(2)

def tmin(fn, fetch, n=5):
    fetch(fn(0))
    best = 1e9
    for i in range(1, n+1):
        t0 = time.time(); fetch(fn(i)); best = min(best, time.time()-t0-0.025)
    return best

loss_fn = make_loss_fn(model, cfg)
raw = model.init(jax.random.PRNGKey(1), batch, True)["params"]
state0 = create_train_state(cfg, raw, steps_per_epoch=100)
params = state0.params  # {"model": ..., "aux": ...}

# fwd loss only (dropout on, like training)
floss = jax.jit(lambda p, b, k: loss_fn(p, b, jnp.int32(0), k)[0])
t_fwd = tmin(lambda i: floss(params, batch, jax.random.fold_in(key, i)), float)

# grad only, no optimizer
fgrad = jax.jit(lambda p, b, k: jax.tree.reduce(
    lambda a, x: a + x.sum().astype(jnp.float32),
    jax.grad(lambda q, bb, kk: loss_fn(q, bb, jnp.int32(0), kk)[0])(p, b, k),
    jnp.float32(0)))
t_grad = tmin(lambda i: fgrad(params, batch, jax.random.fold_in(key, i)), float)

# encoder-only fwd (both passes + heads, no losses)
fenc = jax.jit(lambda p, b, k: model.apply({"params": p["model"]}, b, False,
               rngs={"dropout": k}).img_global.astype(jnp.float32).sum())
t_enc = tmin(lambda i: fenc(params, batch, jax.random.fold_in(key, i)), float)

# pure-GEMM ceiling: 12 layers of QKV/out/up/down at M=17152
M, D, F = 17152, 768, 3072
x0 = jax.random.normal(jax.random.PRNGKey(3), (M, D), jnp.bfloat16)
Ws = [tuple(jax.random.normal(jax.random.PRNGKey(100*i+j), s, jnp.bfloat16) * 0.02
            for j, s in enumerate([(D,D),(D,D),(D,D),(D,D),(D,F),(F,D)]))
      for i in range(12)]
@jax.jit
def gemms(x, s):
    x = x + s
    for q, k_, v, o, u, d in Ws:
        a = x @ q + x @ k_ + x @ v
        x = x + a @ o * 0.01
        x = x + (x @ u) @ d * 0.01
    return x.astype(jnp.float32).sum()
t_gemm = tmin(lambda i: gemms(x0, jnp.bfloat16(i)), float)
gemm_flops = 2 * M * 12 * (4*D*D + 2*D*F)

# full step LAST (donates buffers)
state = create_train_state(cfg, raw, steps_per_epoch=100)
step = make_train_step(model, cfg)
_st = [state]
def _full(i):
    s, m = step(_st[0], batch, jnp.int32(0), jax.random.fold_in(key, i))
    _st[0] = s
    return m
t_full = tmin(_full, lambda m: float(m["loss"]))

mf = train_step_model_flops(B)
print(f"full step   {t_full*1e3:7.1f} ms  MFU {mf/t_full/V5E_BF16_PEAK*100:.1f}%")
print(f"fwd loss    {t_fwd*1e3:7.1f} ms")
print(f"grad only   {t_grad*1e3:7.1f} ms")
print(f"encoder fwd {t_enc*1e3:7.1f} ms (no dropout, deterministic)")
print(f"gemm stack  {t_gemm*1e3:7.1f} ms  = {gemm_flops/t_gemm/1e12:.1f} TF/s "
      f"({gemm_flops/t_gemm/V5E_BF16_PEAK*100:.0f}% peak), {gemm_flops/1e12:.2f} TF")
print(f"optimizer overhead (full - grad): {(t_full-t_grad)*1e3:.1f} ms")
print(f"loss overhead (fwdloss - encoder): {(t_fwd-t_enc)*1e3:.1f} ms")

"""ALADIN training-step throughput on the real chip, at several batch sizes.

Reproduces the README "Measured performance" train rows: the full jitted
train step (dual 12-layer VinVL-base forward, alignment + matching +
distillation losses, backward, global-norm clip, Adam) on synthetic
device-generated batches at the reference geometry (50 text tokens, 34
regions, 2054-d features; ref:alad/train.py:388-471 training regime).

Batch-size knobs map to the memory features that unlock them:
  B <= 384: plain (remat measured 22% SLOWER at B=256 - it is a memory
  feature, not a speed feature); B = 512: remat + alignment-chunk 128
  (OOMs without); B >= 1024: encoder-microbatch (checkpointed encoder
  scan, full-batch loss).

    python benchmarks/train_bench.py [--batches 32,128,512]

Axon-relay timing rules apply (scalar fetch, subtract ~25 ms RT; see
.claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aladin_tpu.config import ExperimentConfig
from aladin_tpu.models.aladin import ALADIN
from aladin_tpu.models.bert_img import BertImgConfig
from aladin_tpu.train.state import create_train_state
from aladin_tpu.train.step import make_train_step
from aladin_tpu.utils.profiling import V5E_BF16_PEAK, train_step_model_flops
from aladin_tpu.utils.rng import make_training_key
from benchmarks.retrieval_eval_bench import synth_batch


def config_for(b: int, hidden: int = 768) -> dict:
    training = {"loss-type": "alignment-distillation", "loss-weights": [1, 1],
                "lr": 1e-5, "bs": b}
    model = {"embed-size": hidden, "tern-layers": 2}
    if b >= 512:
        training["alignment-chunk"] = 128
    if b >= 1024:
        training["encoder-microbatch"] = 256
    return {"model": model, "training": training}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="32,128,512")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--model", default="base", choices=["base", "large"],
                   help="VinVL-base (12x768) or VinVL/Oscar-large (24x1024, "
                        "16 heads, 4096 FFN - the model-zoo large variant)")
    p.add_argument("--fused_layernorm", action="store_true",
                   help="fused residual+LayerNorm Pallas kernel with the "
                        "analytic custom_vjp (BertImgConfig.fused_layernorm)")
    p.add_argument("--fused_attention", action="store_true",
                   help="fused all-heads QK^T+bias+softmax+dropout+PV Pallas "
                        "kernel with exact recompute backward "
                        "(BertImgConfig.fused_attention)")
    p.add_argument("--hidden_act", default="gelu", choices=["gelu", "gelu_tanh"],
                   help="backbone FFN activation; 'gelu_tanh' is the TPU-fast "
                        "tanh approximation (model.hidden-act in the YAML)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="K>1: run K steps per dispatch as one on-device "
                        "lax.scan (make_multi_train_step) and report the "
                        "amortized per-step time — the bs=32 dispatch-floor "
                        "lever (--steps_per_dispatch in cli/train)")
    ns = p.parse_args()
    k = max(1, ns.steps_per_dispatch)

    results = {}
    for b in (int(x) for x in ns.batches.split(",")):
        d = config_for(b, 1024 if ns.model == "large" else 768)
        cfg = ExperimentConfig.from_dict(d)
        large = dict(num_hidden_layers=24, hidden_size=1024,
                     num_attention_heads=16, intermediate_size=4096)
        bert_cfg = BertImgConfig(remat=b >= (128 if ns.model == "large" else 512),
                                 hidden_act=ns.hidden_act,
                                 fused_layernorm=ns.fused_layernorm,
                                 fused_attention=ns.fused_attention,
                                 **(large if ns.model == "large" else {}))
        model = ALADIN(cfg, bert_cfg, dtype=jnp.bfloat16)
        batch = synth_batch(jax.random.PRNGKey(0), b, 50, 34,
                            bert_cfg.img_feature_dim, bert_cfg.vocab_size)
        params = model.init(jax.random.PRNGKey(1), batch, True)["params"]
        state = create_train_state(cfg, params, steps_per_epoch=100)
        if k > 1:
            from aladin_tpu.train.step import make_multi_train_step

            multi = make_multi_train_step(model, cfg)
            wbatch = tuple(batch for _ in range(k))  # K refs, stacked in-jit

            def step(st, _b, ep, key):  # noqa: ANN001 - bench-local shim
                st, m = multi(st, wbatch, ep, key)
                return st, jax.tree.map(lambda v: v[-1], m)
        else:
            step = make_train_step(model, cfg)

        # the production dropout key (rbg on TPU - utils/rng.py; threefry
        # mask generation measured +27% step time at B=128)
        state, metrics = step(state, batch, jnp.int32(0), make_training_key(2))
        float(metrics["loss"])  # compile + warmup fetch
        best = float("inf")
        for i in range(ns.steps):
            t0 = time.time()
            state, metrics = step(state, batch, jnp.int32(0), make_training_key(3 + i))
            float(metrics["loss"])
            best = min(best, (time.time() - t0 - 0.025) / k)
        results[f"B{b}_ms"] = round(best * 1000, 1)
        results[f"B{b}_samples_per_s"] = round(b / best, 1)

        # MFU: analytic model FLOPs (no remat recompute - the standard
        # numerator) vs the v5e bf16 roofline; XLA's own cost analysis of
        # the compiled step is reported alongside as a cross-check (it
        # COUNTS remat recompute, so it upper-bounds the analytic number).
        mf = train_step_model_flops(
            b, hidden=bert_cfg.hidden_size,
            n_layers=bert_cfg.num_hidden_layers,
            intermediate=bert_cfg.intermediate_size)
        tflops = mf / best / 1e12
        results[f"B{b}_model_TFLOPs"] = round(tflops, 1)
        results[f"B{b}_MFU_pct"] = round(100 * mf / best / V5E_BF16_PEAK, 1)
        try:
            if k > 1:
                raise ValueError("cost analysis: K=1 path only")
            ca = step.lower(state, batch, jnp.int32(0),
                            jax.random.PRNGKey(2)).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            if ca and "flops" in ca:
                results[f"B{b}_xla_flops_ratio"] = round(float(ca["flops"]) / mf, 2)
        except Exception:
            pass  # cost analysis is advisory; not all backends expose it
        del state, params, step  # free HBM before the next size

    results["config"] = (f"VinVL-{ns.model} bf16, L=50/R=34, alignment+matching+distill, "
                         f"1 chip, K={k} steps/dispatch; "
                         f"MFU vs {V5E_BF16_PEAK/1e12:.0f} TFLOP/s bf16 peak")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

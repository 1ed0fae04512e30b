"""Caption decode throughput: full-recompute vs KV-cached, on the real chip.

Compares the two jitted lax.scan decoders at the COCO captioning geometry
(VinVL-base backbone, 40 caption slots, 30 OD-label tokens, 50 regions,
ref:oscar/run_captioning.py defaults):

  * tasks/captioning.py  greedy_decode / beam_search_decode — re-run the
    whole (caption+OD+regions) forward every step;
  * tasks/decode_cache.py greedy_decode_cached / beam_search_decode_cached —
    prefill the OD+region K/V once, then two in-flight tokens per step (the
    reference's history_state serving structure).

Outputs are identical (tests/test_decode_cache.py); this measures the cost.

Axon-relay measurement rules (see .claude/skills/verify/SKILL.md): data and
params are created on device, timing forces a scalar fetch and subtracts the
~25 ms round trip, first call per shape is warmup.

    python benchmarks/caption_decode_bench.py [--batch 16] [--beams 5]
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

from aladin_tpu.models.bert_img import BertImgConfig
from aladin_tpu.tasks.captioning import (
    BertImageCaptioner,
    _decode_attention_mask,
    beam_search_decode,
    greedy_decode,
)
from aladin_tpu.tasks.decode_cache import (
    beam_search_decode_cached,
    greedy_decode_cached,
)

CLS, SEP, MASK, PAD = 101, 102, 103, 0


def timed(fn, n=3):
    fn()  # warmup (compile + execute)
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn()
        float(jnp.asarray(out[0]).reshape(-1)[0])  # force a fetch
        best = min(best, time.time() - t0 - 0.025)
    return best


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--beams", type=int, default=5)
    p.add_argument("--max_seq_a", type=int, default=40)
    p.add_argument("--od_width", type=int, default=30)
    p.add_argument("--regions", type=int, default=50)
    ns = p.parse_args()

    cfg = BertImgConfig()  # full VinVL-base
    model = BertImageCaptioner(cfg, dtype=jnp.bfloat16)
    b, la, od_w, r = ns.batch, ns.max_seq_a, ns.od_width, ns.regions
    lt = la + od_w

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    od_ids = jax.random.randint(keys[0], (b, od_w), 1000, 5000, jnp.int32)
    od_seg = jnp.ones((b, od_w), jnp.int32)
    feats = jax.random.normal(keys[1], (b, r, cfg.img_feature_dim), jnp.float32)
    mask = jnp.broadcast_to(
        jnp.asarray(_decode_attention_mask(la, lt, r, od_w, r)),
        (b, lt + r, lt + r))

    ids0 = jnp.concatenate([jnp.full((b, la), MASK, jnp.int32), od_ids], 1)
    seg0 = jnp.concatenate([jnp.zeros((b, la), jnp.int32), od_seg], 1)
    params = model.init(jax.random.PRNGKey(1), ids0, mask, seg0, feats, True)["params"]
    float(jnp.asarray(od_ids[0, 0]))  # tunnel warmup

    kw = dict(max_steps=la - 1, cls_id=CLS, sep_id=SEP, mask_id=MASK, pad_id=PAD)
    results = {}

    t = timed(lambda: greedy_decode(model, params, od_ids, od_seg, feats, mask, **kw))
    results["greedy_full_ms"] = t * 1000
    t = timed(lambda: greedy_decode_cached(
        params, od_ids, od_seg, feats, mask, cfg=cfg, dtype=jnp.bfloat16, **kw))
    results["greedy_cached_ms"] = t * 1000
    t = timed(lambda: beam_search_decode(
        model, params, od_ids, od_seg, feats, mask, num_beams=ns.beams, **kw))
    results["beam_full_ms"] = t * 1000
    t = timed(lambda: beam_search_decode_cached(
        params, od_ids, od_seg, feats, mask, cfg=cfg, dtype=jnp.bfloat16,
        num_beams=ns.beams, **kw))
    results["beam_cached_ms"] = t * 1000

    results["greedy_speedup"] = results["greedy_full_ms"] / results["greedy_cached_ms"]
    results["beam_speedup"] = results["beam_full_ms"] / results["beam_cached_ms"]
    results["captions_per_s_cached_greedy"] = b / (results["greedy_cached_ms"] / 1000)
    results["config"] = f"B={b} beams={ns.beams} la={la} od={od_w} R={r} VinVL-base bf16"
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

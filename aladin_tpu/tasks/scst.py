"""Self-critical sequence training (SCST) for captioning.

Equivalent capability to ref:oscar/utils/caption_evaluate.py:115-197
(ScstRewardCriterion): sample captions, score them with CIDEr-D against the
ground-truth set, subtract the greedy-decode baseline reward, and weight the
sampled tokens' log-probabilities by the advantage:

    loss = - mean over sampled tokens( (r_sample - r_greedy) * logp )

The decode machinery (greedy + sampling via top_k_top_p_filtering) comes
from tasks/captioning.py; the reward is computed host-side (string metric),
the policy-gradient step on device.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np
from jax import Array

from aladin_tpu.eval.cider import CiderD


class ScstRewardCriterion:
    def __init__(self, cider: CiderD | None = None, baseline_type: str = "greedy"):
        assert baseline_type in ("greedy", "sample_mean")
        self.cider = cider or CiderD()
        self.baseline_type = baseline_type

    def rewards(self, sampled: Sequence[str], greedy: Sequence[str],
                gt_sets: Sequence[List[str]]) -> np.ndarray:
        """(advantage per sample,) = CIDEr-D(sample) - baseline."""
        n, g = len(sampled), len(gt_sets)
        # samples are GROUPED per image (the reference's seq_per_img layout,
        # ref:caption_evaluate.py:137-146): sample i belongs to image
        # i // (n // g); greedy j is the one baseline decode of image j
        per = max(n // max(g, 1), 1)
        gts = {i: gt_sets[min(i // per, g - 1)] for i in range(n)}
        gts.update({n + j: gt_sets[j % max(g, 1)] for j in range(len(greedy))})
        res = {i: [s] for i, s in enumerate(list(sampled) + list(greedy))}
        _, scores = self.cider.compute_score(gts, res)
        sample_scores = scores[:n]
        if self.baseline_type == "greedy":
            base = scores[n:]
            if len(base) == 0:
                base = np.zeros(1)
            baseline = np.repeat(base, per)[:n]
            if len(baseline) < n:  # ragged n not divisible by g
                baseline = np.pad(baseline, (0, n - len(baseline)), mode="edge")
        else:
            baseline = np.full(n, sample_scores.mean())
        return sample_scores - baseline

    @staticmethod
    def loss(advantage: Array, token_logprobs: Array, token_mask: Array) -> Array:
        """- mean over REAL sampled tokens of advantage * logp
        (ref:caption_evaluate.py:190-196 semantics)."""
        weighted = -advantage[:, None] * token_logprobs * token_mask
        return jnp.sum(weighted) / jnp.maximum(jnp.sum(token_mask), 1)

"""Profiling hooks (SURVEY.md S5.1: the reference has wall-clock meters only;
the TPU build adds JAX profiler traces on top of the same meters)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace (view with TensorBoard's profile tab
    or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


def transformer_layer_flops(seq: int, d_model: int, d_ff: int) -> float:
    """Forward matmul FLOPs of one post-LN transformer encoder layer for one
    sequence (multiply-add = 2 FLOPs):

      QKV + output projections: 4 * 2*S*d^2
      attention scores + mixing: 2 * 2*S^2*d
      FFN (two matmuls):         2 * 2*S*d*d_ff

    Elementwise work (softmax, LN, gelu, bias) is omitted - it is bandwidth,
    not MXU FLOPs, and <2% of the total at these widths.
    """
    return 8 * seq * d_model**2 + 4 * seq**2 * d_model + 4 * seq * d_model * d_ff


def train_step_model_flops(
    batch: int,
    text_len: int = 50,
    img_text_len: int = 50,
    n_regions: int = 34,
    hidden: int = 768,
    n_layers: int = 12,
    intermediate: int = 3072,
    img_feature_dim: int = 2054,
    tern_layers: int = 2,
    alignment: bool = True,
) -> float:
    """MODEL FLOPs of one ALADIN train step (forward + backward, EXCLUDING
    remat recompute - the standard MFU numerator), at the reference geometry
    (ref:alad/train.py:388-471: dual disentangled 12-layer pass at
    max_seq_length=50 / max_img_seq_length=34, README.md:70).

    Accounting:
      * caption pass:  S=text_len tokens through n_layers BERT layers;
      * image pass:    S=img_text_len + n_regions tokens (OD-label text
        concatenated with region features, ref:alad_model.py:134-140) plus
        the img_embedding Linear(2054->768) on the regions;
      * matching head: tern_layers TE (d_ff = hidden) over both token sets
        (ref:alad_model.py:231-235);
      * alignment loss: the B^2 * R * W * d similarity tensor, R/W stripped
        of specials (-1 region, -3 words, ref:alad/loss.py:87-90);
      * matching loss:  B^2 global dot products (negligible, included);
      * backward = 2x forward for every matmul (dL/dW and dL/dx GEMMs).

    Returns total FLOPs for the whole batch (divide by seconds for FLOP/s).
    """
    s_img = img_text_len + n_regions
    fwd = 0.0
    for s in (text_len, s_img):
        fwd += batch * n_layers * transformer_layer_flops(s, hidden, intermediate)
    fwd += batch * 2 * n_regions * img_feature_dim * hidden  # img projection
    # the matching head always runs, even alignment-only (ref defect S2.6(2))
    for s in (text_len, s_img):
        fwd += batch * tern_layers * transformer_layer_flops(s, hidden, hidden)
    if alignment:
        fwd += 2 * batch * batch * (n_regions - 1) * (text_len - 3) * hidden
    fwd += 2 * batch * batch * hidden  # global score matrix
    return 3.0 * fwd  # fwd + 2x bwd


V5E_BF16_PEAK = 197e12  # TPU v5e bf16 peak FLOP/s (one chip)


class StepTimer:
    """Host-side step timer that forces device completion via a tiny fetch
    (on the axon relay, block_until_ready does not block - see
    .claude/skills/verify)."""

    def __init__(self):
        self.t0 = time.time()

    def lap(self, fetchable=None) -> float:
        if fetchable is not None:
            jax.block_until_ready(fetchable)
        dt = time.time() - self.t0
        self.t0 = time.time()
        return dt

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

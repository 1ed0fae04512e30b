"""Training PRNG selection — dropout mask generation is a real TPU cost.

JAX's default threefry PRNG generates random bits with serial VPU work;
at B=128 dropout-mask generation is ~24% of the full ALADIN train step on
one v5e chip (measured: 145 ms/step threefry vs 114 ms 'rbg' vs 110 ms
with dropout disabled — the 'rbg' implementation, XLA's hardware
``RngBitGenerator``, makes dropout effectively free). 'unsafe_rbg'
measured no faster than 'rbg' here, so it is supported but not the
default. Training quality is unaffected — masks are iid Bernoulli under
every implementation; only the specific bit pattern differs.

The trade-off: threefry draws are bitwise-stable across topologies and
XLA versions; rbg draws are not guaranteed stable across shardings or
compiler upgrades. Hence the ``training.rng-impl`` config knob:

  * ``auto`` (default): 'rbg' on TPU, 'threefry' elsewhere — production
    TPU training gets the fast path while CPU tests (which assert e.g.
    mesh-vs-solo weight parity under identical dropout draws) keep the
    bitwise-reproducible generator;
  * ``threefry`` | ``rbg`` | ``unsafe_rbg``: explicit override — use
    'threefry' when bitwise run-to-run reproducibility across different
    mesh shapes matters more than the ~27% step-time win.

The reference has no analogous choice (CUDA's Philox dropout is already
hardware-rate, ref:alad/train.py:416 just calls the torch model); this
knob exists because the threefry default is the one place JAX's
functional RNG discipline costs real step time on TPU.
"""

from __future__ import annotations

import jax

RNG_IMPLS = ("auto", "threefry", "rbg", "unsafe_rbg")


def make_training_key(seed: int, impl: str = "auto") -> jax.Array:
    """PRNG key for the training loop's dropout streams.

    'threefry' returns the legacy uint32 key (exactly what
    ``jax.random.PRNGKey`` has always produced here, keeping existing
    test-locked draw sequences); other impls return typed key arrays that
    carry their implementation, so every downstream ``jax.random`` call
    (fold_in / split / bernoulli inside flax Dropout) uses the fast
    generator without global flags.
    """
    if impl not in RNG_IMPLS:
        raise ValueError(f"rng-impl must be one of {RNG_IMPLS}, got {impl!r}")
    if impl == "auto":
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry"
    if impl == "threefry":
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)

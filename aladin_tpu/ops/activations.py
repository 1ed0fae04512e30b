"""Exact-erf GELU with an analytic custom VJP — a MEASURED DEAD-END kept
as a library utility.

Hypothesis (round 3): autodiff's gelu backward re-evaluates the ``erfc``
polynomial, so an analytic VJP (save the forward's erfc term, backward =
cdf(x) + x*pdf(x), one ``exp``) should reclaim most of the erf-vs-tanh
train-step gap.

Chip A/B (round 4, same process, B=128 full train step): **neutral** —
110.9 ms/step both ways, bit-identical loss. Explanation: JAX's erfc
derivative rule is already ``-2/sqrt(pi) * exp(-x^2)`` (no erfc re-eval),
and XLA keeps the forward's erfc value as a residual on its own; the
erf-vs-tanh gap lives in the FORWARD polynomial, which no VJP can touch.
The backbone therefore keeps plain ``jax.nn.gelu`` (models/bert_img.py);
this module stays because its forward is locked bit-identical to
``jax.nn.gelu(x, approximate=False)`` and its gradients are verified
against autodiff (tests/test_activations.py), making it a safe drop-in
anywhere an explicit-residual gelu is wanted (e.g. custom remat policies
that want to keep the erfc term but not recompute it).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_INV_SQRT_2PI = float(1.0 / np.sqrt(2.0 * np.pi))


@jax.custom_vjp
def gelu_exact(x):
    """``jax.nn.gelu(x, approximate=False)`` with an analytic backward."""
    return _value(x)


def _value(x):
    # mirror jax.nn.gelu's exact expression (0.5 * x * erfc(-x * sqrt(1/2)),
    # constants cast to the input dtype) so the forward is bit-identical
    sqrt_half = np.sqrt(0.5).astype(x.dtype)
    return jnp.array(0.5 * x * lax.erfc(-x * sqrt_half), dtype=x.dtype)


def _fwd(x):
    sqrt_half = np.sqrt(0.5).astype(x.dtype)
    erfc_term = lax.erfc(-x * sqrt_half)  # = 2 * cdf(x)
    return jnp.array(0.5 * x * erfc_term, dtype=x.dtype), (x, erfc_term)


def _bwd(res, g):
    x, erfc_term = res
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)
    return (jnp.array(g * (0.5 * erfc_term + x * pdf), dtype=x.dtype),)


gelu_exact.defvjp(_fwd, _bwd)

"""All-pairs similarity measures over global embeddings.

Pure-function equivalents of the reference's sim functions
(ref:alad/loss.py:8-26). Matmuls accumulate in float32 regardless of input
dtype so bf16 embeddings are safe on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def l2norm(x: Array, axis: int = -1, eps: float = 0.0) -> Array:
    """L2-normalize along ``axis``.

    With ``eps=0`` this matches the reference's bare division
    (ref:alad/utils.py:134-139); pass eps>0 for torch.nn.functional.normalize
    semantics (clamp denominator at 1e-12), used for set embeddings
    (ref:alad/loss.py:80-81).
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    if eps:
        norm = jnp.maximum(norm, eps)
    return x / norm


def dot_sim(im: Array, s: Array) -> Array:
    """(N, D) x (M, D) -> (N, M) raw inner products (ref:alad/loss.py:8-11)."""
    return jnp.matmul(im, s.T, preferred_element_type=jnp.float32)


def cosine_sim(im: Array, s: Array) -> Array:
    """Normalized inner products (ref:alad/loss.py:13-18)."""
    return dot_sim(l2norm(im), l2norm(s))


def order_sim(im: Array, s: Array) -> Array:
    """Order-embedding similarity -||max(0, s - im)||_2, transposed to
    (n_im, n_s) (ref:alad/loss.py:20-26)."""
    # (M_s, N_im, D)
    diff = jnp.maximum(s[:, None, :] - im[None, :, :], 0.0)
    score = -jnp.sqrt(jnp.sum(jnp.square(diff), axis=2))
    return score.T


SIMILARITIES = {"dot": dot_sim, "cosine": cosine_sim, "order": order_sim}


def get_similarity(measure: str):
    try:
        return SIMILARITIES[measure]
    except KeyError:
        raise ValueError(f"unknown measure {measure!r}; expected one of {sorted(SIMILARITIES)}")

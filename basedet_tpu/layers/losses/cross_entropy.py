"""Binary / weighted cross-entropy.

Capability analogue of /root/reference/basedet/layers/losses/cross_entropy.py:7-37.
All reductions are left to callers (losses return elementwise values) so the
static-shape masking idiom composes cleanly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_cross_entropy(
    pred: jnp.ndarray, label: jnp.ndarray, with_logits: bool = True
) -> jnp.ndarray:
    """Elementwise BCE. ``with_logits=True`` uses the numerically-stable
    log-sigmoid formulation."""
    if with_logits:
        # max(x,0) - x*z + log(1 + exp(-|x|))
        return (
            jnp.maximum(pred, 0)
            - pred * label
            + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    eps = 1e-7
    p = jnp.clip(pred, eps, 1 - eps)
    return -(label * jnp.log(p) + (1 - label) * jnp.log(1 - p))


def weighted_cross_entropy(
    logits: jnp.ndarray, label: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Per-class weighted softmax CE (DETR's class loss with down-weighted
    background; reference cross_entropy.py:25-37).

    logits: (..., C); label: (...,) int; weight: (C,).
    Returns sum(loss) / sum(weight[label]) — the weighted mean.
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, label[..., None], axis=-1)[..., 0]
    w = weight[label]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)

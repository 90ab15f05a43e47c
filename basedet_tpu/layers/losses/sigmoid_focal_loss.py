"""Sigmoid focal loss (elementwise).

Capability analogue of /root/reference/basedet/layers/losses/sigmoid_focal_loss.py:9-35.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .cross_entropy import binary_cross_entropy


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = -1,
    gamma: float = 0,
) -> jnp.ndarray:
    """FL(p_t) = -alpha_t (1 - p_t)^gamma log(p_t); elementwise, no reduction."""
    scores = jax.nn.sigmoid(logits)
    loss = binary_cross_entropy(logits, targets, with_logits=True)
    if gamma != 0:
        loss = loss * (targets * (1 - scores) + (1 - targets) * scores) ** gamma
    if alpha >= 0:
        loss = loss * (targets * alpha + (1 - targets) * (1 - alpha))
    return loss

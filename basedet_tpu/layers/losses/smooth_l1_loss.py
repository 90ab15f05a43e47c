"""Smooth-L1 loss (elementwise).

Capability analogue of /root/reference/basedet/layers/losses/smooth_l1_loss.py:7.
beta == 0 degenerates to pure L1 (the RetinaNet default, SMOOTH_L1_BETA=0.0).
"""
from __future__ import annotations

import jax.numpy as jnp


def smooth_l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0
) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)

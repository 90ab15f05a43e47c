"""Random label subsampling with static shapes.

Capability analogue of /root/reference/basedet/layers/common/sampling.py:7-30
(sample_labels). TPU-native: the reference's cond_take + dynamic topk becomes
a rank-vs-quota comparison — every shape static, quota may be a traced
scalar (needed for "fill remaining with background" logic, rpn.py:233-236).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_mask(
    rng: jax.Array, candidates: jnp.ndarray, quota
) -> jnp.ndarray:
    """Pick at most ``quota`` True entries of ``candidates`` uniformly.

    candidates: (N,) bool. quota: int or traced scalar. Returns (N,) bool.
    """
    n = candidates.shape[0]
    noise = jax.random.uniform(rng, (n,))
    scores = jnp.where(candidates, noise, -1.0)
    order = jnp.argsort(-scores)             # candidates first, random order
    ranks = jnp.argsort(order)               # rank of each element
    return candidates & (ranks < quota)


def sample_labels(
    rng: jax.Array,
    labels: jnp.ndarray,
    num_samples,
    label_value: int,
    ignore_label: int = -1,
) -> jnp.ndarray:
    """Keep at most ``num_samples`` entries equal to ``label_value``; demote
    the surplus (randomly chosen) to ``ignore_label``."""
    mask = labels == label_value
    keep = sample_mask(rng, mask, num_samples)
    return jnp.where(mask & ~keep, ignore_label, labels)

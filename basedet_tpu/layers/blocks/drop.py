"""Stochastic depth / DropPath (reference layers/blocks/drop.py:9-31)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def drop_path(rng, x: jnp.ndarray, drop_prob: float) -> jnp.ndarray:
    """Drop whole residual branches per sample (train-time only)."""
    if drop_prob <= 0.0:
        return x
    keep = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return x / keep * mask


class DropPath(nn.Module):
    drop_prob: float = 0.0
    train: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.train or self.drop_prob <= 0.0:
            return x
        return drop_path(self.make_rng("dropout"), x, self.drop_prob)

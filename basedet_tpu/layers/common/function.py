"""Small functional helpers.

Capability analogue of /root/reference/basedet/layers/common/function.py:12-54.
The dynamic ones change meaning under static shapes:
  * non_zeros/cond_take → masked top-k (`masked_topk`) — the TPU idiom;
  * permute_to_N_Any_K lives in models/det/retinanet._flatten_level (NHWC
    makes it a pure reshape).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ShapeSpec(NamedTuple):
    """(reference layers/common/shape.py:6-13)."""

    channels: int = 0
    height: int = 0
    width: int = 0
    stride: int = 0


def safelog(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return jnp.log(jnp.maximum(x, eps))


def meshgrid(y: jnp.ndarray, x: jnp.ndarray):
    """(reference function.py meshgrid): returns grids shaped (len(y), len(x))."""
    gy = jnp.broadcast_to(y[:, None], (y.shape[0], x.shape[0]))
    gx = jnp.broadcast_to(x[None, :], (y.shape[0], x.shape[0]))
    return gx, gy


def topk_scores(scores: jnp.ndarray, k: int, approx: bool = True):
    """Top-k candidate selection for inference.

    On TPU, exact ``lax.top_k`` fully sorts the (R·C)-wide score vector —
    the dominant cost of dense-head inference at A=9 (4.6M entries at 640²).
    ``lax.approx_max_k`` uses the TPU's partial-reduction unit at
    recall ≥ 0.99 for a fraction of the cost; the NMS stage makes the final
    selection, so mAP impact is nil. Training paths keep exact top-k.
    """
    if approx and jax.default_backend() == "tpu":
        return jax.lax.approx_max_k(scores, k, recall_target=0.99)
    return jax.lax.top_k(scores, k)


def masked_topk(
    values: jnp.ndarray, mask: jnp.ndarray, k: int, fill=-1e10
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape replacement for `cond_take + topk`: top-k of ``values``
    restricted to ``mask``; returns (values (k,), indices (k,), valid (k,))."""
    masked = jnp.where(mask, values, fill)
    top_v, top_i = jax.lax.top_k(masked, k)
    return top_v, top_i, top_v > fill / 2


def is_empty_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Traced emptiness check (reference is_empty_tensor, but as a value —
    control flow must use lax.cond under jit)."""
    return ~jnp.any(mask)

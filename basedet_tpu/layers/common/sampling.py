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
    rng: jax.Array, candidates: jnp.ndarray, quota, cap: int | None = None
) -> jnp.ndarray:
    """Pick at most ``quota`` True entries of ``candidates`` uniformly.

    candidates: (N,) bool. quota: int or traced scalar. Returns (N,) bool.

    ``cap``: static upper bound on ``quota``. When given, the selection is a
    ``lax.top_k(·, cap)`` + threshold-value compare instead of a full double
    argsort — on TPU two 76k-element argsorts cost ~10 ms/batch in the RPN
    (measured v5e, playground/ablate_frcnn_phases.py) while top_k(76k, 256)
    is ~0.2 ms. Exact same distribution; on an f32 noise collision at the
    threshold one extra element may be kept — at N=76k anchors that is
    p ≈ N/2²⁴ ≈ 0.5% of calls (a few images per epoch carry quota+1
    samples; loss normalizers divide by the realized count, so the effect
    is one extra sampled anchor, not a scaling bug).
    """
    n = candidates.shape[0]
    noise = jax.random.uniform(rng, (n,))
    scores = jnp.where(candidates, noise, -1.0)
    if cap is None:
        order = jnp.argsort(-scores)         # candidates first, random order
        ranks = jnp.argsort(order)           # rank of each element
        return candidates & (ranks < quota)
    cap = min(cap, n)
    top, _ = jax.lax.top_k(scores, cap)
    q = jnp.clip(quota, 0, cap)
    # threshold = q-th largest score; keep >= it (rare tie keeps one extra).
    # If quota exceeds the candidate count the threshold lands on a -1.0
    # filler and every candidate is kept — still "at most quota".
    thr = jnp.where(q > 0, top[jnp.maximum(q - 1, 0)], jnp.inf)
    return candidates & (scores >= thr)


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

"""Decompose the Pallas RoIAlign 34.4 ms (FRCNN b8 phase E) into parts.

The separable formulation is H-dense: stage 1 contracts the FULL H axis of
each level per roi group even though a 7x7 pool of a P2-assigned roi
touches ~15 of 160 rows (py is ~90% zeros at P2). Hypothesis: phase E is
MXU-bound on that wasted work, not HBM-bound. Parts timed (b8 640 bf16,
R=512, realistic roi size distribution):
  - roi level histogram (how much lands on P2)
  - full fwd / full fwd+bwd (production entry)
  - per-level fwd and bwd pallas calls in isolation
  - host prep (_prepare: level sort + weight build)
  - epilogue (level-sum + unpermute gather)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B, R, REPS, N_TIMED = 8, 512, 4, 5
SIZE = 640
STRIDES = (4, 8, 16, 32)
C = 256


def timed(name, prog, *args):
    s = jax.tree_util.tree_leaves(prog(*args))[0]
    float(np.asarray(s).reshape(-1)[0])
    t0 = time.perf_counter()
    outs = [prog(*args) for _ in range(N_TIMED)]
    float(np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


def make_rois(rng):
    """RPN-proposal-like boxes: log-uniform sqrt(area) in [8, 448],
    aspect in [0.5, 2], uniform centers."""
    sa = np.exp(rng.uniform(np.log(8), np.log(448), (B, R)))
    ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0), (B, R)))
    w = sa * np.sqrt(ar)
    h = sa / np.sqrt(ar)
    cx = rng.uniform(0, SIZE, (B, R))
    cy = rng.uniform(0, SIZE, (B, R))
    x1 = np.clip(cx - w / 2, 0, SIZE - 1)
    y1 = np.clip(cy - h / 2, 0, SIZE - 1)
    x2 = np.clip(cx + w / 2, x1 + 1, SIZE)
    y2 = np.clip(cy + h / 2, y1 + 1, SIZE)
    return jnp.asarray(np.stack([x1, y1, x2, y2], -1).astype(np.float32))


def main():
    from basedet_tpu.ops.roi_align_pallas import (
        _level_call_bwd, _level_call_fwd, _prepare, pool_rois_multilevel,
    )
    from basedet_tpu.ops.roi_align_separable import roi_level_assignment

    rng = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rng.randn(B, SIZE // s, SIZE // s, C).astype(np.float32),
                    dtype=jnp.bfloat16)
        for s in STRIDES
    )
    rois = make_rois(rng)

    lvl = np.asarray(roi_level_assignment(rois, 2, 5, 4, 224))
    hist = [(lvl == i).mean() for i in range(4)]
    print("roi level fractions P2..P5:",
          " ".join(f"{h:.3f}" for h in hist), flush=True)

    # ---- production entry, fwd and fwd+bwd
    @jax.jit
    def prog_fwd(fs, r):
        acc = jnp.float32(0)
        for k in range(REPS):
            acc += pool_rois_multilevel(
                fs, r + jnp.float32(k), STRIDES, (7, 7)
            ).astype(jnp.float32).sum()
        return acc

    @jax.jit
    def prog_fb(fs, r):
        def loss(fs):
            acc = jnp.float32(0)
            for k in range(REPS):
                acc += pool_rois_multilevel(
                    fs, r + jnp.float32(k), STRIDES, (7, 7)
                ).astype(jnp.float32).sum()
            return acc
        l, g = jax.value_and_grad(loss)(fs)
        return l + sum(x.astype(jnp.float32).sum() for x in g)

    timed("full fwd", prog_fwd, feats, rois)
    timed("full fwd+bwd", prog_fb, feats, rois)

    # ---- host prep alone
    @jax.jit
    def prog_prep(fs, r):
        acc = jnp.float32(0)
        for k in range(REPS):
            per_level, order = _prepare(
                fs, r + jnp.float32(k), STRIDES, (7, 7), 2, True, 4, 224
            )
            acc += order.astype(jnp.float32).sum()
            for py, px, m in per_level:
                acc += py.astype(jnp.float32).sum() + m.sum()
        return acc

    timed("prep (sort + weights + masks)", prog_prep, feats, rois)

    # ---- per-level kernels in isolation (shared prep, computed once)
    per_level, order = jax.jit(
        lambda fs, r: _prepare(fs, r, STRIDES, (7, 7), 2, True, 4, 224)
    )(feats, rois)
    g_up = jnp.asarray(
        rng.randn(B, R, 7, 7, C).astype(np.float32), dtype=jnp.bfloat16
    )

    for li, name in enumerate(("P2", "P3", "P4", "P5")):
        py, px, mask = per_level[li]

        @jax.jit
        def prog_lf(f, py, px, mask):
            acc = jnp.float32(0)
            for k in range(REPS):
                acc += _level_call_fwd(
                    f + jnp.bfloat16(k), py, px, mask, False
                ).astype(jnp.float32).sum()
            return acc

        @jax.jit
        def prog_lb(g, fshape_feat, py, px, mask):
            acc = jnp.float32(0)
            for k in range(REPS):
                acc += _level_call_bwd(
                    g + jnp.bfloat16(k), fshape_feat.shape, jnp.bfloat16,
                    py, px, mask, False,
                ).astype(jnp.float32).sum()
            return acc

        timed(f"{name} fwd kernel", prog_lf, feats[li], py, px, mask)
        timed(f"{name} bwd kernel", prog_lb, g_up, feats[li], py, px, mask)


if __name__ == "__main__":
    main()

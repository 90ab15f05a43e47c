"""3x3/stride-2 max-pool with an elementwise backward (no select-and-scatter).

XLA's max-pool gradient is a SelectAndScatter — a windowed serial scan that
lowers poorly on TPU. For the overlapping 3x3/s2/pad-1 pool (the ResNet
stem, models/cls/resnet.py) the gradient factors into 9 elementwise
compare+mask products on the OUTPUT grid — one per window offset, taken in
row-major order so ties route to the first maximum exactly like XLA — and a
parity interleave (ops/subpixel.py trick) instead of any scatter:

    dx[2m+a, 2n+b] = Σ_{(u,v) ≡ (a,b)} dy[i,j] · first_max[i,j,(u,v)]

Opt-in via BASEDET_MAXPOOL_BWD=subpix until the on-TPU A/B lands
(playground/tpu_return_plan.sh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pool_fwd(x):
    """flax nn.max_pool(x, (3,3), strides=(2,2), padding=((1,1),(1,1)))."""
    return jax.lax.reduce_window(
        x, -jnp.asarray(jnp.inf, x.dtype), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@jax.custom_vjp
def max_pool_3x3_s2(x):
    return _pool_fwd(x)


def _fwd(x):
    y = _pool_fwd(x)
    return y, (x, y)


def _bwd(res, dy):
    x, y = res
    B, H, W, C = x.shape
    Ho, Wo = y.shape[1], y.shape[2]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)

    # per window offset (row-major): first-max mask, then dy routed there
    taken = jnp.zeros(y.shape, bool)
    contrib = {}
    for u in range(3):
        for v in range(3):
            w = jax.lax.slice(
                xp, (0, u, v, 0),
                (B, u + 2 * Ho - 1, v + 2 * Wo - 1, C), (1, 2, 2, 1),
            )  # (B, Ho, Wo, C): window element (u, v) of every window
            sel = (w == y) & ~taken
            taken = taken | sel
            contrib[(u, v)] = jnp.where(sel, dy, 0)

    # scatter-free interleave: input row q = 2i + u − 1 has parity a=(u+1)%2;
    # u∈{0,2} both land on odd rows (i shifted by one for u=0)
    def axis_merge(c0, c2):
        # odd rows: q = 2m+1 ← u=2 at i=m  PLUS  u=0 at i=m+1
        return c2 + jnp.pad(c0[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))

    # first merge the u (row) axis per v, keeping (even_row, odd_row) planes
    row = {}
    for v in range(3):
        row[("e", v)] = contrib[(1, v)]                       # q even
        row[("o", v)] = axis_merge(contrib[(0, v)], contrib[(2, v)])
    planes = {}
    for a, tag in ((0, "e"), (1, "o")):
        ce = row[(tag, 1)]
        co = row[(tag, 2)] + jnp.pad(
            row[(tag, 0)][:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
        planes[(a, 0)] = ce
        planes[(a, 1)] = co

    h2, w2 = (H + 1) // 2, (W + 1) // 2

    def fit(t):
        return t[:, :h2, :w2]

    r0 = jnp.stack([fit(planes[(0, 0)]), fit(planes[(0, 1)])], axis=3)
    r1 = jnp.stack([fit(planes[(1, 0)]), fit(planes[(1, 1)])], axis=3)
    rows = jnp.stack([r0, r1], axis=2)  # (B, h2, 2, w2, 2, C)
    dx = rows.reshape(B, 2 * h2, 2 * w2, C)[:, :H, :W]
    # parity note: even input rows q=2m come from u=1 at i=m (dx row index
    # 2m ↔ (a=0, m)); odd rows q=2m+1 from u∈{0,2} (a=1, m). The reshape
    # interleaves (a=0, a=1) per m → rows 2m, 2m+1 ✓.
    return (dx,)


max_pool_3x3_s2.defvjp(_fwd, _bwd)


def use_subpixel_maxpool_bwd() -> bool:
    import os

    return os.environ.get("BASEDET_MAXPOOL_BWD") == "subpix"

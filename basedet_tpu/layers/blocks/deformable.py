"""Deformable convolution v1/v2 as bilinear gather + dense mix (TPU-native).

Capability analogue of /root/reference/basedet/layers/blocks/deformable.py:9-66
(DeformConvWithOff / ModulatedDeformConvWithOff wrapping MegEngine's native
CUDA DeformableConv2d). XLA has no DCN primitive; the TPU formulation samples
the K=k·k offset taps with one batched bilinear gather and mixes taps with a
dense layer over (K·C) — mathematically identical parameterization to the
native kernel (weights reshaped), and it lowers to gathers + one MXU matmul.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from basedet_tpu.layers.precision import Conv, Dense


def _bilinear_sample_batched(img: jnp.ndarray, y: jnp.ndarray,
                             x: jnp.ndarray) -> jnp.ndarray:
    """img (B, H, W, C); y/x (B, ...) float coords. Zero padding outside.

    Block-gather formulation: the 2x2 corner block of every sample is ONE
    gathered (4C)-wide row from a zero-padded block table — TPU gather cost
    scales with row count, so this is ~4x fewer rows than per-corner
    gathers (same trick as ops/roi_align.py; measured there). Zero padding
    reproduces the per-corner inside-mask semantics exactly for anchors in
    [-1, H]; anchors clamped from farther out are killed by ``valid``.

    The batch dim is explicit (not vmapped) so the gather's transpose can
    route to the batched Pallas one-hot scatter (ops/scatter_onehot.py) —
    the scatter is the dominant cost of the CenterNet train step.
    """
    B, H, W, C = img.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = (y - y0).astype(img.dtype)
    wx = (x - x0).astype(img.dtype)

    fp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (B, H+2, W+2, C)
    blk = jnp.concatenate(
        [
            fp[:, : H + 1, : W + 1],
            fp[:, : H + 1, 1 : W + 2],
            fp[:, 1 : H + 2, : W + 1],
            fp[:, 1 : H + 2, 1 : W + 2],
        ],
        axis=-1,
    ).reshape(B, (H + 1) * (W + 1), 4 * C)

    ay = y0.astype(jnp.int32) + 1  # anchor in padded coords
    ax = x0.astype(jnp.int32) + 1
    valid = (ay >= 0) & (ay <= H) & (ax >= 0) & (ax <= W)
    ayc = jnp.clip(ay, 0, H)
    axc = jnp.clip(ax, 0, W)
    flat = (ayc * (W + 1) + axc).reshape(B, -1)
    from basedet_tpu.ops.scatter_onehot import gather_rows_batched

    v = gather_rows_batched(blk, flat).reshape(*y.shape, 4, C)

    w = jnp.stack(
        [
            (1 - wy) * (1 - wx),
            (1 - wy) * wx,
            wy * (1 - wx),
            wy * wx,
        ],
        axis=-1,
    ) * valid.astype(img.dtype)[..., None]  # (..., 4)
    return jnp.einsum("...k,...kc->...c", w, v)


def _bilinear_sample(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Unbatched wrapper of :func:`_bilinear_sample_batched` —
    img (H, W, C); y/x (...,) float coords."""
    return _bilinear_sample_batched(img[None], y[None], x[None])[0]


class ModulatedDeformConv(nn.Module):
    """DCNv2 (modulated); ksize fixed 3x3, stride 1, pad 1, 1 deform group."""

    out_channels: int
    modulated: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        K = 9
        n_off = 2 * K + (K if self.modulated else 0)
        # offset/mask branch initialized to zero (standard DCN init)
        off = Conv(
            n_off, (3, 3), padding=1,
            kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros_init(),
            name="conv_offset",
        )(x)
        offsets = off[..., : 2 * K].reshape(B, H, W, K, 2)  # (dy, dx) per tap
        if self.modulated:
            mask = jax.nn.sigmoid(off[..., 2 * K:])  # (B, H, W, K)
        else:
            mask = jnp.ones((B, H, W, K), x.dtype)

        ky, kx = jnp.meshgrid(
            jnp.arange(-1.0, 2.0), jnp.arange(-1.0, 2.0), indexing="ij"
        )
        ky = ky.reshape(-1)  # (9,)
        kx = kx.reshape(-1)
        gy, gx_ = jnp.meshgrid(
            jnp.arange(H, dtype=x.dtype), jnp.arange(W, dtype=x.dtype),
            indexing="ij",
        )
        ys = gy[None, :, :, None] + ky[None, None, None, :] + offsets[..., 0]
        xs = gx_[None, :, :, None] + kx[None, None, None, :] + offsets[..., 1]

        sampled = _bilinear_sample_batched(x, ys, xs)  # (B, H, W, K, C)
        sampled = sampled * mask[..., None]
        sampled = sampled.reshape(B, H, W, K * C)
        return Dense(
            self.out_channels,
            kernel_init=nn.initializers.he_normal(),
            name="weight",
        )(sampled)


class DeformConv(ModulatedDeformConv):
    """DCNv1 (no modulation)."""

    modulated: bool = False  # type: ignore[assignment]

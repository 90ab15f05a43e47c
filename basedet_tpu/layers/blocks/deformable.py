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


def _bilinear_sample(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C); y/x (...,) float coords. Zero padding outside."""
    H, W, C = img.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = y - y0
    wx = x - x0

    def tap(yy, xx):
        inside = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        yy_c = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xx_c = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        vals = img[yy_c, xx_c]  # (..., C)
        return jnp.where(inside[..., None], vals, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return (
        v00 * ((1 - wy) * (1 - wx))[..., None]
        + v01 * ((1 - wy) * wx)[..., None]
        + v10 * (wy * (1 - wx))[..., None]
        + v11 * (wy * wx)[..., None]
    )


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

        sampled = jax.vmap(
            lambda img, yy, xx: _bilinear_sample(img, yy, xx)
        )(x, ys, xs)  # (B, H, W, K, C)
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

"""CenterNet head stack (flax.linen, NHWC).

Capability analogue of /root/reference/basedet/layers/head/center_head.py:13-131
(DeconvLayer: DCN + bilinear-initialized ConvTranspose; CenternetDeconv;
SingleHead; CenterHead with prior-prob classifier bias).
"""
from __future__ import annotations

import math
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from basedet_tpu.layers.blocks.deformable import DeformConv, ModulatedDeformConv
from basedet_tpu.ops.subpixel import SubpixelConvTranspose2x
from basedet_tpu.layers.common.blocks import get_norm
from basedet_tpu.layers.precision import Conv


def _bilinear_upsample_kernel(k: int, channels: int) -> np.ndarray:
    """Bilinear-interpolation ConvTranspose kernel (HWIO, depthwise-style
    identical filter per channel; reference DeconvLayer.init_module)."""
    f = math.ceil(k / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros((k, k), np.float32)
    for i in range(k):
        for j in range(k):
            w[i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    kernel = np.zeros((k, k, channels, channels), np.float32)
    for ch in range(channels):
        kernel[:, :, ch, ch] = w
    return kernel


class DeconvLayer(nn.Module):
    out_channels: int
    deconv_kernel: int = 4
    modulate_deform: bool = True
    train: bool = False

    @nn.compact
    def __call__(self, x):
        dcn_cls = ModulatedDeformConv if self.modulate_deform else DeformConv
        x = dcn_cls(self.out_channels, name="dcn")(x)
        x = get_norm("BN", self.train)()(x)
        x = jax.nn.relu(x)
        k = self.deconv_kernel
        assert k == 4, "reference CenterNet uses 4x4 deconvs"
        # torch-parity ConvTranspose2d(4,4,s2,p1) via the sub-pixel path:
        # exact 2H output (flax ConvTranspose pads the dilated input and
        # yields 2H-2 — wrong output stride) and dense stride-1 MXU convs
        # instead of the ~2.7 TF/s input-dilated lowering (ops/subpixel.py).
        x = SubpixelConvTranspose2x(
            self.out_channels,
            kernel_init=lambda rng, shape, dtype=jnp.float32: jnp.asarray(
                _bilinear_upsample_kernel(k, self.out_channels), dtype
            ),
            name="up_sample",
        )(x)
        x = get_norm("BN", self.train)()(x)
        return jax.nn.relu(x)


class CenternetDeconv(nn.Module):
    channels: Sequence[int] = (2048, 256, 128, 64)
    deconv_kernels: Sequence[int] = (4, 4, 4)
    modulate_deform: bool = True
    train: bool = False

    @nn.compact
    def __call__(self, x):
        for i, (c, k) in enumerate(zip(self.channels[1:], self.deconv_kernels)):
            x = DeconvLayer(
                c, k, self.modulate_deform, self.train, name=f"deconv{i + 1}"
            )(x)
        return x


class SingleHead(nn.Module):
    out_channels: int
    bias_value: float = 0.0

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jax.nn.relu(
            Conv(c, (3, 3), padding=1, name="feat_conv")(x)
        )
        return Conv(
            self.out_channels, (1, 1),
            bias_init=nn.initializers.constant(self.bias_value),
            name="out_conv",
        )(x)


class CenterHead(nn.Module):
    num_classes: int = 80
    prior_prob: float = 0.1

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls = jax.nn.sigmoid(
            SingleHead(self.num_classes, bias_value, name="cls_head")(x)
        )
        wh = SingleHead(2, name="wh_head")(x)
        reg = SingleHead(2, name="reg_head")(x)
        return {"cls": cls, "wh": wh, "reg": reg}

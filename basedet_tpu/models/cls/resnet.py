"""ResNet backbones (18/34/50/101/152) in flax.linen, NHWC.

Capability analogue of /root/reference/basedet/models/cls/resnet.py:116-258
(torchvision-style v1.5: stride on the 3x3 conv of Bottleneck), with
``extract_features`` -> {"stem", "res2", "res3", "res4", "res5"} and FrozenBN
+ freeze_at semantics. TPU-native: freeze_at applies ``lax.stop_gradient`` at
the stage boundary (structural freezing — frozen affine/statistics live in the
'frozen' collection, see layers/common/blocks.py), and all convs run NHWC.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.layers.common.blocks import get_norm
from basedet_tpu.layers.precision import Conv

class _S2DStemConv(nn.Module):
    """The ResNet 7x7/s2 p3 stem conv, computed on the space-to-depth
    packing (exact; see ops/s2d_conv.py). Param tree/layout identical to
    ``Conv(64, (7, 7), (2, 2), padding=3, use_bias=False)``."""

    features: int = 64

    @nn.compact
    def __call__(self, x):
        from basedet_tpu.layers.precision import compute_dtype
        from basedet_tpu.ops.s2d_conv import s2d_conv

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], self.features),
        )
        dt = compute_dtype()
        if dt is not None:
            x, kernel = x.astype(dt), kernel.astype(dt)
        if x.shape[1] % 2 or x.shape[2] % 2:
            # odd inputs can't pack; images are padded to x32 in every
            # production path, so this is only reachable from raw unit tests
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return s2d_conv(x, kernel, 3)


_STAGE_SPECS: Dict[str, Tuple[str, Sequence[int]]] = {
    # resnet10 is not in the reference zoo; it exists for fast tests and the
    # multichip dryrun gate (1 block per stage, same feature protocol).
    "resnet10": ("basic", (1, 1, 1, 1)),
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}

RESNET_OUT_CHANNELS: Dict[str, Dict[str, int]] = {
    "basic": {"stem": 64, "res2": 64, "res3": 128, "res4": 256, "res5": 512},
    "bottleneck": {
        "stem": 64,
        "res2": 256,
        "res3": 512,
        "res4": 1024,
        "res5": 2048,
    },
}


def resnet_feature_channels(name: str) -> Dict[str, int]:
    block, _ = _STAGE_SPECS[name]
    return RESNET_OUT_CHANNELS[block]


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    norm: str = "FrozenBN"
    train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        norm = get_norm(self.norm, self.train)
        identity = x
        y = Conv(self.channels, (3, 3), (self.stride,) * 2, padding=1,
                    use_bias=False, name="conv1")(x)
        y = norm()(y)
        y = jax.nn.relu(y)
        y = Conv(self.channels, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = norm()(y)
        if x.shape[-1] != self.channels or self.stride != 1:
            identity = Conv(self.channels, (1, 1), (self.stride,) * 2,
                               use_bias=False, name="downsample_conv")(x)
            identity = norm()(identity)
        return jax.nn.relu(y + identity)


class Bottleneck(nn.Module):
    channels: int  # bottleneck width; output is channels * 4
    stride: int = 1
    norm: str = "FrozenBN"
    train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        norm = get_norm(self.norm, self.train)
        out_c = self.channels * 4
        identity = x
        y = Conv(self.channels, (1, 1), use_bias=False, name="conv1")(x)
        y = norm()(y)
        y = jax.nn.relu(y)
        y = Conv(self.channels, (3, 3), (self.stride,) * 2, padding=1,
                    use_bias=False, name="conv2")(y)
        y = norm()(y)
        y = jax.nn.relu(y)
        y = Conv(out_c, (1, 1), use_bias=False, name="conv3")(y)
        y = norm()(y)
        if x.shape[-1] != out_c or self.stride != 1:
            identity = Conv(out_c, (1, 1), (self.stride,) * 2,
                               use_bias=False, name="downsample_conv")(x)
            identity = norm()(identity)
        return jax.nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet feature extractor.

    Args:
        arch: one of resnet18/34/50/101/152.
        norm: norm layer for all stages ("FrozenBN" default — detection).
        freeze_at: 0 = train all; 1 = freeze stem; 2 = freeze stem + res2
            (reference FREEZE_AT semantics, solver/default_solver.py:80-124 +
            config MODEL.BACKBONE.FREEZE_AT).
        out_features: which features to return from extract_features.
    """

    arch: str = "resnet50"
    norm: str = "FrozenBN"
    freeze_at: int = 2
    out_features: Sequence[str] = ("res3", "res4", "res5")
    train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        block_type, stage_sizes = _STAGE_SPECS[self.arch]
        block = BasicBlock if block_type == "basic" else Bottleneck
        norm = get_norm(self.norm, self.train)

        # stem: 7x7/2 conv + 3x3/2 maxpool. The conv runs as a dense 4x4/s1
        # conv on the space-to-depth packing (ops/s2d_conv.py, exact same
        # operator): 3->12 input channels quadruple the MXU K-fill —
        # measured b8 640px f+b 5.04 -> 3.98 ms, fwd 3.35 -> 2.64
        # (playground/probe_stems.py r50 rows); identical param tree.
        y = _S2DStemConv(name="conv1")(x)
        y = norm()(y)
        y = jax.nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        if self.freeze_at >= 1:
            y = jax.lax.stop_gradient(y)
        feats: Dict[str, jnp.ndarray] = {"stem": y}

        widths = (64, 128, 256, 512)
        for stage_idx, (n_blocks, width) in enumerate(zip(stage_sizes, widths)):
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                y = block(
                    channels=width,
                    stride=stride if b == 0 else 1,
                    norm=self.norm,
                    train=self.train,
                    name=f"layer{stage_idx + 1}_{b}",
                )(y)
            if self.freeze_at >= stage_idx + 2:
                y = jax.lax.stop_gradient(y)
            feats[f"res{stage_idx + 2}"] = y

        return {k: feats[k] for k in self.out_features}

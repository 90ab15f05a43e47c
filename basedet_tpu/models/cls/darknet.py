"""Darknet-21/53 backbone (flax.linen, NHWC).

Capability analogue of /root/reference/basedet/models/cls/darknet.py:32-118:
conv-bn-lrelu stem + 5 stride-2 stages of residual DarknetBlocks.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.layers.blocks.yolo_block import _ConvBNAct

DEPTH2BLOCKS = {21: (1, 1, 2, 2, 1), 53: (1, 2, 8, 8, 4)}


def darknet_feature_channels(out_channels: int = 32) -> Dict[str, int]:
    chans = {"stem": out_channels}
    c = out_channels
    for i in range(5):
        c *= 2
        chans[f"dark{i + 1}"] = c
    return chans


class DarknetBlock(nn.Module):
    act: str = "lrelu"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = _ConvBNAct(c // 2, 1, 1, act=self.act, train=self.train,
                       bn_eps=1e-5, bn_momentum=0.9, name="layer1")(x)
        y = _ConvBNAct(c, 3, 1, act=self.act, train=self.train,
                       bn_eps=1e-5, bn_momentum=0.9, name="layer2")(y)
        return x + y


class Darknet(nn.Module):
    depth: int = 53
    out_channels: int = 32
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        kw = dict(act="lrelu", train=self.train, bn_eps=1e-5, bn_momentum=0.9)
        outputs = {}
        x = _ConvBNAct(self.out_channels, 3, 1, **kw, name="stem")(x)
        outputs["stem"] = x
        c = self.out_channels
        for i, n_blocks in enumerate(DEPTH2BLOCKS[self.depth]):
            name = f"dark{i + 1}"
            c *= 2
            x = _ConvBNAct(c, 3, 2, **kw, name=f"{name}_down")(x)
            for b in range(n_blocks):
                x = DarknetBlock(train=self.train, name=f"{name}_block{b}")(x)
            outputs[name] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}

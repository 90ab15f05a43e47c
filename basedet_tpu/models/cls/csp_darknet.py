"""CSPDarknet backbone (YOLOX), flax.linen NHWC.

Capability analogue of /root/reference/basedet/models/cls/csp_darknet.py:10-95:
Focus stem → dark2..dark5 (stride-2 conv + CSP layers; SPP in dark5).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.layers.blocks.yolo_block import (
    CSPLayer,
    Focus,
    SPPBottleneck,
    make_conv,
)


class CSPDarknet(nn.Module):
    depth_factor: float = 1.0
    width_factor: float = 1.0
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    depthwise: bool = False
    act: str = "silu"
    train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        Conv = make_conv(self.depthwise)
        base_depth = max(round(self.depth_factor * 3), 1)
        base_c = int(self.width_factor * 64)

        outputs = {}
        x = Focus(base_c, 3, act=self.act, train=self.train, name="stem")(x)
        outputs["stem"] = x

        specs = [
            ("dark2", base_c * 2, base_depth, True, False),
            ("dark3", base_c * 4, base_depth * 3, True, False),
            ("dark4", base_c * 8, base_depth * 3, True, False),
            ("dark5", base_c * 16, base_depth, False, True),
        ]
        for name, ch, n, shortcut, with_spp in specs:
            x = Conv(ch, 3, 2, act=self.act, train=self.train,
                     name=f"{name}_conv")(x)
            if with_spp:
                x = SPPBottleneck(ch, act=self.act, train=self.train,
                                  name=f"{name}_spp")(x)
            x = CSPLayer(
                ch, n=n, shortcut=shortcut, depthwise=self.depthwise,
                act=self.act, train=self.train, name=f"{name}_csp",
            )(x)
            outputs[name] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}

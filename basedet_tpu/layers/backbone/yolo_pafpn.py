"""YOLOX PAFPN neck (flax.linen, NHWC).

Capability analogue of /root/reference/basedet/layers/backbone/yolo_fpn.py:93-199
(YOLOPAFPN: top-down FPN + bottom-up PAN over CSP layers). Upsampling is
nearest 2x (YOLOX's Upsample).
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.layers.blocks.yolo_block import CSPLayer, _ConvBNAct, make_conv


def _upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class YOLOPAFPN(nn.Module):
    depth: float = 1.0
    width: float = 1.0
    in_channels: Sequence[int] = (256, 512, 1024)
    depthwise: bool = False
    act: str = "silu"
    train: bool = False

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]) -> List[jnp.ndarray]:
        """features: [dark3 (/8), dark4 (/16), dark5 (/32)] → PAN outs."""
        Conv = make_conv(self.depthwise)
        w = lambda c: int(c * self.width)
        n = round(3 * self.depth)
        kw = dict(act=self.act, train=self.train)
        [x2, x1, x0] = features

        fpn_out0 = _ConvBNAct(w(self.in_channels[1]), 1, 1, **kw,
                              name="lateral_conv0")(x0)
        f_out0 = jnp.concatenate([_upsample2x_nearest(fpn_out0), x1], axis=-1)
        f_out0 = CSPLayer(w(self.in_channels[1]), n=n, shortcut=False,
                          depthwise=self.depthwise, **kw, name="C3_p4")(f_out0)

        fpn_out1 = _ConvBNAct(w(self.in_channels[0]), 1, 1, **kw,
                              name="reduce_conv1")(f_out0)
        f_out1 = jnp.concatenate([_upsample2x_nearest(fpn_out1), x2], axis=-1)
        pan_out2 = CSPLayer(w(self.in_channels[0]), n=n, shortcut=False,
                            depthwise=self.depthwise, **kw, name="C3_p3")(f_out1)

        p_out1 = Conv(w(self.in_channels[0]), 3, 2, **kw, name="bu_conv2")(pan_out2)
        p_out1 = jnp.concatenate([p_out1, fpn_out1], axis=-1)
        pan_out1 = CSPLayer(w(self.in_channels[1]), n=n, shortcut=False,
                            depthwise=self.depthwise, **kw, name="C3_n3")(p_out1)

        p_out0 = Conv(w(self.in_channels[1]), 3, 2, **kw, name="bu_conv1")(pan_out1)
        p_out0 = jnp.concatenate([p_out0, fpn_out0], axis=-1)
        pan_out0 = CSPLayer(w(self.in_channels[2]), n=n, shortcut=False,
                            depthwise=self.depthwise, **kw, name="C3_n4")(p_out0)

        return [pan_out2, pan_out1, pan_out0]

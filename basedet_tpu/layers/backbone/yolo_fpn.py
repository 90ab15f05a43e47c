"""YOLOv3 embedding FPN (flax.linen, NHWC).

Capability analogue of /root/reference/basedet/layers/backbone/yolo_fpn.py:13-92
(YOLOFPN): per-branch 6-conv embedding whose 5th activation taps the lateral
path; coarse→fine with nearest-2x upsample + concat.
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.layers.backbone.yolo_pafpn import _upsample2x_nearest
from basedet_tpu.layers.blocks.yolo_block import _ConvBNAct


class YOLOFPN(nn.Module):
    """Consumes bottom-up features fine→coarse (e.g. [dark3, dark4, dark5])
    and returns per-level raw prediction maps coarse→fine."""

    out_channels: Sequence[int]          # per output level
    mid_channels: Sequence[Sequence[int]]  # [(ch1, ch2)] per branch
    train: bool = False

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]) -> List[jnp.ndarray]:
        kw = dict(act="lrelu", train=self.train, bn_eps=1e-5, bn_momentum=0.9)

        def branch(x, mid, out_c, name):
            """6 conv embedding + 1x1 head; returns (head_out, tap)."""
            ch1, ch2 = mid
            specs = [(ch1, 1), (ch2, 3), (ch1, 1), (ch2, 3), (ch1, 1), (ch2, 3)]
            tap = None
            for i, (c, k) in enumerate(specs):
                x = _ConvBNAct(c, k, 1, **kw, name=f"{name}_conv{i}")(x)
                if i == 4:
                    tap = x
            out = nn.Conv(out_c, (1, 1), name=f"{name}_pred")(x)
            return out, tap

        feats = list(features)[::-1]  # coarse→fine
        outs = []
        x = feats[0]
        out, tap = branch(x, self.mid_channels[0], self.out_channels[0],
                          "output_conv0")
        outs.append(out)
        for idx in range(1, len(feats)):
            lat = _ConvBNAct(
                self.mid_channels[idx][0], 1, 1, **kw,
                name=f"lateral_conv{idx}",
            )(tap)
            x = jnp.concatenate([_upsample2x_nearest(lat), feats[idx]], axis=-1)
            out, tap = branch(x, self.mid_channels[idx], self.out_channels[idx],
                              f"output_conv{idx}")
            outs.append(out)
        return outs

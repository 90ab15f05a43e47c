"""Feature Pyramid Network (flax.linen, NHWC).

Capability analogue of /root/reference/basedet/layers/backbone/fpn_backbone.py:12-204
(FPN with lateral+output convs, bilinear top-down, optional top blocks FPNP6
and LastLevelP6P7). The bottom-up backbone is composed by the caller; this
module maps an ordered dict of backbone features to pyramid features
p<k>...p<k+n>. Upsampling uses ``jax.image.resize`` (XLA-lowered) matching the
reference's BILINEAR interpolate at fpn_backbone.py:143.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.layers.common.blocks import get_norm, msra_normal
from basedet_tpu.layers.precision import Conv, ConvTranspose


def _upsample2x(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample to the spatial size of ``like`` (half-pixel
    centers, matching F.nn.interpolate(..., mode="BILINEAR"))."""
    n, h, w, c = like.shape
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


class FPN(nn.Module):
    """Builds p-levels from bottom-up features.

    Args:
        in_features: bottom-up feature names, fine→coarse (e.g. res3,res4,res5).
        strides: their strides (e.g. 8,16,32).
        out_channels: pyramid channel width.
        norm: optional norm for lateral/output convs (None or "GN"/"BN").
        top_block: None | "p6" (maxpool P6, two-stage) | "p6p7" (RetinaNet).
        top_block_in_feature: "res5"/"c5" to read from backbone, "p5" to chain.
    """

    in_features: Sequence[str] = ("res3", "res4", "res5")
    strides: Sequence[int] = (8, 16, 32)
    out_channels: int = 256
    norm: Optional[str] = None
    top_block: Optional[str] = "p6p7"
    top_block_in_feature: str = "res5"
    upsample: str = "resize"
    train: bool = False

    @nn.compact
    def __call__(self, bottom_up: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        norm_ctor = get_norm(self.norm, self.train)
        use_bias = self.norm is None
        kinit = msra_normal("fan_in")

        # coarse→fine top-down pass
        names = list(self.in_features)[::-1]
        feats = [bottom_up[f] for f in names]

        results: List[jnp.ndarray] = []
        prev = None
        for i, (name, feat) in enumerate(zip(names, feats)):
            lateral = Conv(
                self.out_channels, (1, 1), use_bias=use_bias,
                kernel_init=kinit, name=f"fpn_lateral_{name}",
            )(feat)
            if norm_ctor is not None:
                lateral = norm_ctor()(lateral)
            if prev is not None:
                if self.upsample == "deconv":
                    td = ConvTranspose(
                        self.out_channels, (2, 2), strides=(2, 2),
                        kernel_init=kinit, name=f"fpn_upsample_{name}",
                    )(prev)
                else:
                    td = _upsample2x(prev, lateral)
                lateral = lateral + td
            prev = lateral
            out = Conv(
                self.out_channels, (3, 3), padding=1, use_bias=use_bias,
                kernel_init=kinit, name=f"fpn_output_{name}",
            )(lateral)
            if norm_ctor is not None:
                out = norm_ctor()(out)
            results.append(out)
        results = results[::-1]  # fine→coarse

        # output names: p<log2 stride>
        import math

        out_names = [f"p{int(math.log2(s))}" for s in self.strides]
        outputs = dict(zip(out_names, results))
        last_stage = int(math.log2(self.strides[-1]))

        if self.top_block == "p6":
            # stride-2 subsample of the last pyramid level (FPNP6: 1x1/2 maxpool)
            p_last = outputs[f"p{last_stage}"]
            outputs[f"p{last_stage + 1}"] = p_last[:, ::2, ::2, :]
        elif self.top_block == "p6p7":
            if self.top_block_in_feature in bottom_up:
                src = bottom_up[self.top_block_in_feature]
            else:
                src = outputs[self.top_block_in_feature]
            p6 = Conv(self.out_channels, (3, 3), (2, 2), padding=1,
                         kernel_init=kinit, name="fpn_p6")(src)
            p7 = Conv(self.out_channels, (3, 3), (2, 2), padding=1,
                         kernel_init=kinit, name="fpn_p7")(jax.nn.relu(p6))
            outputs[f"p{last_stage + 1}"] = p6
            outputs[f"p{last_stage + 2}"] = p7
        return outputs

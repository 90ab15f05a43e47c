"""Backbone dispatch by config name.

Capability analogue of /root/reference/basedet/layers/backbone/build.py:6-34
(named cls-model dispatch; the reference's basecls-zoo adapter becomes a
registry hook — external zoos are out of scope on TPU, but the dispatch
protocol is preserved so new backbones register by name).
"""
from __future__ import annotations

from typing import Sequence

from basedet_tpu.utils import registers


def build_backbone_module(backbone_cfg, train: bool = False,
                          out_features: Sequence[str] = None):
    """Returns a flax module instance for MODEL.BACKBONE."""
    name = backbone_cfg.NAME
    out_features = tuple(
        out_features or backbone_cfg.get("OUT_FEATURES", ())
    )
    if name.startswith("resnet"):
        from basedet_tpu.models.cls.resnet import ResNet

        return ResNet(
            arch=name,
            norm=backbone_cfg.get("NORM", "FrozenBN"),
            freeze_at=backbone_cfg.get("FREEZE_AT", 0),
            out_features=out_features,
            train=train,
        )
    if name.startswith("darknet"):
        from basedet_tpu.models.cls.darknet import Darknet

        depth = int(name.replace("darknet", ""))
        return Darknet(depth=depth, out_features=out_features, train=train)
    if name == "csp_darknet":
        from basedet_tpu.models.cls.csp_darknet import CSPDarknet

        return CSPDarknet(out_features=out_features, train=train)
    if name in registers.models:
        return registers.models.get(name)
    raise ValueError(f"unknown backbone {name!r}")

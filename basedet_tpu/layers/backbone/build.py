"""Backbone dispatch by config name.

Capability analogue of /root/reference/basedet/layers/backbone/build.py:6-34
(named cls-model dispatch; the reference's basecls-zoo adapter becomes a
registry hook — external zoos are out of scope on TPU, but the dispatch
protocol is preserved so new backbones register by name).
"""
from __future__ import annotations

from typing import Sequence

from basedet_tpu.utils import registers


def make_backbone(
    name: str,
    out_features: Sequence[str] = (),
    norm: str = "FrozenBN",
    freeze_at: int = 0,
    train: bool = False,
    module_name: str = "bottom_up",
):
    """Dispatch a backbone flax module by name.

    In-repo families (resnet/darknet/csp_darknet), the HF external-zoo
    adapter (``hf_<preset>``, hf_adaptor.py), or any registered module name —
    the TPU analogue of the reference's three-way dispatch
    (basecls adapter / ARCH / named cls model, backbone/build.py:6-34)."""
    out_features = tuple(out_features)
    if name.startswith("hf_"):
        from basedet_tpu.layers.backbone.hf_adaptor import HFBackboneAdapter

        return HFBackboneAdapter(
            name_or_cfg=name[len("hf_"):],
            out_features=out_features or ("res3", "res4", "res5"),
            train=train,
            name=module_name,
        )
    if name.startswith("resnet"):
        from basedet_tpu.models.cls.resnet import ResNet

        return ResNet(
            arch=name,
            norm=norm,
            freeze_at=freeze_at,
            out_features=out_features,
            train=train,
            name=module_name,
        )
    if name.startswith("darknet"):
        from basedet_tpu.models.cls.darknet import Darknet

        depth = int(name.replace("darknet", ""))
        return Darknet(depth=depth, out_features=out_features, train=train,
                       name=module_name)
    if name == "csp_darknet":
        from basedet_tpu.models.cls.csp_darknet import CSPDarknet

        return CSPDarknet(out_features=out_features, train=train,
                          name=module_name)
    if name in registers.models:
        return registers.models.get(name)
    raise ValueError(f"unknown backbone {name!r}")


def build_backbone_module(backbone_cfg, train: bool = False,
                          out_features: Sequence[str] = None):
    """Returns a flax module instance for MODEL.BACKBONE."""
    return make_backbone(
        backbone_cfg.NAME,
        out_features=tuple(out_features or backbone_cfg.get("OUT_FEATURES", ())),
        norm=backbone_cfg.get("NORM", "FrozenBN"),
        freeze_at=backbone_cfg.get("FREEZE_AT", 0),
        train=train,
    )

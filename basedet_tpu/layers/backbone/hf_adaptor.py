"""External backbone-zoo adapter: HuggingFace ``transformers`` Flax models.

Capability analogue of the reference's basecls-zoo adapter
(/root/reference/basedet/layers/backbone/basecls_adaptor.py:12-211): wrap an
external classification-model zoo as a detection backbone with multi-scale
feature extraction, per-model out-feature/channel tables, and an
``auto_convert_cfg_*`` helper that rewrites a detection config for the chosen
backbone. basecls is a MegEngine-only product zoo; the TPU-native equivalent
zoo is ``transformers``'s Flax vision models (ResNet / RegNet families — the
conv backbones an FPN consumes), which are baked into this environment.

Where the reference extracts features with forward hooks
(basecls_adaptor.py:24-28 via feature_extract), flax modules are functional:
we request ``output_hidden_states`` from the wrapped module and index the
returned pyramid — no hook machinery needed.

Weights: ``load_hf_weights`` reads a *local* ``from_pretrained`` directory
(this environment has no network egress; the reference's analogous S3
download protocol is at basecls_adaptor.py:189-197) and returns a pytree that
drops into this module's scope in the detection param tree.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

from flax import linen as nn


# -- preset configs (offline analogue of the reference's name->zoo tables) ----
# stage channels are derived from the HF config (hidden_sizes), so unlike the
# reference (basecls_adaptor.py:64-186) no hand-maintained channel table is
# needed; only the architectures themselves are presets.
_RESNET_PRESETS = {
    # name: (embedding_size, hidden_sizes, depths, layer_type)
    "resnet18": (64, (64, 128, 256, 512), (2, 2, 2, 2), "basic"),
    "resnet34": (64, (64, 128, 256, 512), (3, 4, 6, 3), "basic"),
    "resnet50": (64, (256, 512, 1024, 2048), (3, 4, 6, 3), "bottleneck"),
    "resnet101": (64, (256, 512, 1024, 2048), (3, 4, 23, 3), "bottleneck"),
    "resnet152": (64, (256, 512, 1024, 2048), (3, 8, 36, 3), "bottleneck"),
}

_REGNET_PRESETS = {
    # name: (embedding_size, hidden_sizes, depths, groups_width, layer_type)
    "regnety_004": (32, (48, 104, 208, 440), (1, 3, 6, 6), 8, "y"),
    "regnety_016": (32, (48, 120, 336, 888), (2, 6, 17, 2), 24, "y"),
    "regnety_040": (32, (128, 192, 512, 1088), (2, 6, 12, 2), 64, "y"),
    "regnetx_016": (32, (72, 168, 408, 912), (2, 4, 10, 2), 24, "x"),
    "regnetx_040": (32, (80, 240, 560, 1360), (2, 5, 14, 2), 40, "x"),
}

# hidden_states layout of HF ResNet/RegNet with output_hidden_states=True:
# (embeddings, stage1, stage2, stage3, stage4) at strides (4, 4, 8, 16, 32).
_STAGE_INDEX = {"res2": 1, "res3": 2, "res4": 3, "res5": 4}


def _make_hf_config(name: str):
    """Build the transformers config for a preset name (no network)."""
    if name in _RESNET_PRESETS:
        from transformers import ResNetConfig

        emb, hidden, depths, layer_type = _RESNET_PRESETS[name]
        return "resnet", ResNetConfig(
            embedding_size=emb,
            hidden_sizes=list(hidden),
            depths=list(depths),
            layer_type=layer_type,
        )
    if name in _REGNET_PRESETS:
        from transformers import RegNetConfig

        emb, hidden, depths, gw, layer_type = _REGNET_PRESETS[name]
        return "regnet", RegNetConfig(
            embedding_size=emb,
            hidden_sizes=list(hidden),
            depths=list(depths),
            groups_width=gw,
            layer_type=layer_type,
        )
    raise ValueError(
        f"unknown hf backbone {name!r}; presets: "
        f"{sorted(_RESNET_PRESETS) + sorted(_REGNET_PRESETS)} "
        "(or pass a local from_pretrained directory via load_hf_weights)"
    )


def get_feature_setting(name: str) -> Tuple[str, ...]:
    """Default FPN inputs (reference basecls_adaptor.py:42-61)."""
    return ("res3", "res4", "res5")


def get_channel_setting(name: str) -> Tuple[int, ...]:
    """Channels of get_feature_setting(name) (basecls_adaptor.py:64-186) —
    derived from the preset config rather than a hand-typed table."""
    _, cfg = _make_hf_config(name)
    hs = tuple(cfg.hidden_sizes)
    return tuple(hs[_STAGE_INDEX[f] - 1] for f in get_feature_setting(name))


class HFBackboneAdapter(nn.Module):
    """Wraps a transformers Flax vision module as a detection backbone.

    Returns {feature_name: NHWC tensor} like the in-repo backbones, so FPN
    and heads are agnostic to where the backbone came from (the reference's
    BackboneAdapter.extract_features contract, basecls_adaptor.py:20-28).
    """

    name_or_cfg: Any  # preset name, or a transformers PretrainedConfig
    out_features: Sequence[str] = ("res3", "res4", "res5")
    train: bool = False

    @nn.compact
    def __call__(self, x) -> Dict[str, Any]:
        if isinstance(self.name_or_cfg, str):
            family, cfg = _make_hf_config(self.name_or_cfg)
        else:
            cfg = self.name_or_cfg
            family = cfg.model_type
        if family == "resnet":
            from transformers.models.resnet.modeling_flax_resnet import (
                FlaxResNetModule,
            )

            inner = FlaxResNetModule(config=cfg, name="hf")
        elif family == "regnet":
            from transformers.models.regnet.modeling_flax_regnet import (
                FlaxRegNetModule,
            )

            inner = FlaxRegNetModule(config=cfg, name="hf")
        else:
            raise ValueError(f"unsupported hf model family {family!r}")

        out = inner(
            x,
            deterministic=not self.train,
            output_hidden_states=True,
            return_dict=True,
        )
        hidden = out.hidden_states
        # HF flax vision modules run NHWC internally but may transpose
        # hidden_states to NCHW for torch API parity; stage channel counts
        # are known from the config, so the layout resolves deterministically.
        hs = tuple(cfg.hidden_sizes)
        feats = {}
        for f in self.out_features:
            h = hidden[_STAGE_INDEX[f]]
            want_c = hs[_STAGE_INDEX[f] - 1]
            if h.shape[-1] != want_c and h.shape[1] == want_c:
                h = h.transpose(0, 2, 3, 1)
            feats[f] = h
        return feats


def load_hf_weights(path: str):
    """Load a local transformers Flax checkpoint directory and return the
    params pytree positioned for HFBackboneAdapter's scope ({'hf': ...})."""
    from transformers import FlaxAutoModel

    model = FlaxAutoModel.from_pretrained(path, local_files_only=True)
    return {"hf": model.params}


def auto_convert_cfg_to_hf(cfg, hf_backbone: str = "resnet50"):
    """Rewrite a detection config to use an HF-zoo backbone
    (reference basecls_adaptor.py:200-211)."""
    cfg.MODEL.BACKBONE.NAME = "hf_" + hf_backbone
    out_features = get_feature_setting(hf_backbone)
    out_channels = get_channel_setting(hf_backbone)
    cfg.MODEL.BACKBONE.OUT_FEATURES = list(out_features)
    cfg.MODEL.BACKBONE.OUT_FEATURE_CHANNELS = list(out_channels)
    if "FPN" in cfg.MODEL:
        cfg.MODEL.FPN.TOP_BLOCK_IN_FEATURE = out_features[-1]
        cfg.MODEL.FPN.TOP_BLOCK_IN_CHANNELS = out_channels[-1]
    return cfg

"""Checkpoint conversion: torch/MegEngine-layout state dicts → flax trees.

The reference zoo ships pickle state dicts with OIHW conv kernels and
``module.submodule.weight`` naming (utils/checkpoint.py handles loading).
This module converts such dicts into this framework's variable trees:
  * conv kernels OIHW → HWIO;
  * linear weights (out, in) → (in, out);
  * BN {weight, bias, running_mean, running_var} → FrozenBN
    {scale, bias, mean, var} (or flax BatchNorm params/batch_stats);
then hands the renamed flat dict to the smart matcher
(utils/checkpoint.load_matched_weights) for suffix/shape resolution.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from .checkpoint import load_matched_weights, unwarp_ckpt


def _to_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach()
    if hasattr(x, "numpy"):
        x = x.numpy()
    return np.asarray(x)


def convert_torch_style_state(
    state: Mapping, deconv_keys=()
) -> Dict[str, np.ndarray]:
    """Normalize a torch/MegEngine flat state dict into HWIO/flax layout
    with FrozenBN-style key names.

    ``deconv_keys``: iterable of key prefixes (or substrings) naming
    ConvTranspose2d modules. Their 4-D weights are (Ci, Co, kh, kw) — NOT
    OIHW — so they need transpose(2, 3, 0, 1), not (2, 3, 1, 0). CenterNet
    zoo deconvs are square-channel (Ci == Co), so the wrong transpose would
    load silently with swapped I/O axes.
    """
    state = unwarp_ckpt(state)
    deconv_keys = tuple(deconv_keys)
    # modules with running stats are BN — their (1, C, 1, 1)-shaped
    # MegEngine weight/bias must NOT take the conv OIHW branch
    bn_prefixes = {
        k[: -len(".running_mean")] for k in state if k.endswith(".running_mean")
    }
    out: Dict[str, np.ndarray] = {}
    for key, val in state.items():
        arr = _to_numpy(val)
        is_bn = key.rsplit(".", 1)[0] in bn_prefixes
        k = key.replace(".", "/")
        if is_bn:
            if k.endswith("/weight"):
                k = k[: -len("/weight")] + "/scale"
            arr = arr.reshape(-1)
            k = k.replace("/running_mean", "/mean")
            k = k.replace("/running_var", "/var")
            out[k] = arr
            continue
        if arr.ndim == 4 and k.endswith("/weight"):
            if any(d in key for d in deconv_keys):
                # ConvTranspose2d (Ci, Co, kh, kw) → HWIO
                arr = arr.transpose(2, 3, 0, 1)
            else:
                # conv OIHW → HWIO
                arr = arr.transpose(2, 3, 1, 0)
            k = k[: -len("/weight")] + "/kernel"
        elif arr.ndim == 2 and k.endswith("/weight"):
            arr = arr.T
            k = k[: -len("/weight")] + "/kernel"
        elif k.endswith("/weight"):
            k = k[: -len("/weight")] + "/scale"
        k = k.replace("/running_mean", "/mean")
        k = k.replace("/running_var", "/var")
        out[k] = arr
    return out


def convert_reference_detector_state(state: Mapping) -> Dict[str, np.ndarray]:
    """Reference (MegEngine basedet) detector naming → this framework's tree.

    Handles the structural renames that layout conversion alone can't:
      * ``backbone.`` wrapper removed — FPN convs/top block live under
        ``fpn``, the trunk under ``bottom_up`` (reference retinanet.py:46:
        ``self.backbone = layers.FPN(bottom_up=resnet)``);
      * Sequential indices flattened: ``layer1.0.`` → ``layer1_0.``,
        ``cls_subnet.2.`` → ``cls_subnet_2.`` (flax has no Sequential);
      * BN submodule names → flax auto-named FrozenBatchNorm_k in block
        call order: bn1→_0, bn2→_1[, bn3→_2], downsample.1 → last
        (models/cls/resnet.py blocks);
      * ``downsample.0`` (conv) → ``downsample_conv``;
      * ``fpn_lateral3`` → ``fpn.fpn_lateral_res3`` etc.,
        ``top_block.p6`` → ``fpn.fpn_p6``.
    Then defers to convert_torch_style_state for OIHW→HWIO / BN-stat key /
    Linear-transpose layout conversion.
    """
    import re

    state = unwarp_ckpt(state)
    # detect block type by presence of any bn3 key (Bottleneck) so the
    # downsample BN gets the right flax auto-index
    has_bn3 = any(".bn3." in k for k in state)
    ds_bn = "FrozenBatchNorm_3" if has_bn3 else "FrozenBatchNorm_2"

    renamed = {}
    for key, val in state.items():
        k = key
        k = re.sub(r"^backbone\.bottom_up\.", "bottom_up.", k)
        k = re.sub(r"^backbone\.top_block\.(p\d)\.", r"fpn.fpn_\1.", k)
        k = re.sub(r"^backbone\.fpn_lateral(\d)\.", r"fpn.fpn_lateral_res\1.", k)
        k = re.sub(r"^backbone\.fpn_output(\d)\.", r"fpn.fpn_output_res\1.", k)
        k = re.sub(r"\.downsample\.0\.", ".downsample_conv.", k)
        k = re.sub(r"\.downsample\.1\.", f".{ds_bn}.", k)
        k = re.sub(r"\.bn(\d)\.", lambda m: f".FrozenBatchNorm_{int(m.group(1)) - 1}.", k)
        k = re.sub(r"^bn(\d)\.", lambda m: f"FrozenBatchNorm_{int(m.group(1)) - 1}.", k)
        # flatten remaining Sequential numeric indices: name.N. → name_N.
        k = re.sub(r"\.(\d+)\.", r"_\1.", k)
        renamed[k] = val
    # reference CenterNet deconvs are named up_sample
    # (reference layers/head/center_head.py:33: self.up_sample =
    # M.ConvTranspose2d(...)) — (Ci, Co, kh, kw) layout
    return convert_torch_style_state(renamed, deconv_keys=("up_sample",))


def load_reference_checkpoint(variables: Any, state: Mapping, strict=False,
                              detector_naming: bool = False, **kw):
    """Convert + smart-match a reference-layout checkpoint into ``variables``.

    ``detector_naming=True`` applies the reference basedet detector renames
    (backbone wrapper, Sequential indices, BN auto-names) first — use it for
    zoo detector checkpoints; plain torch-style CNN dicts don't need it.
    """
    convert = (
        convert_reference_detector_state if detector_naming
        else convert_torch_style_state
    )
    return load_matched_weights(variables, convert(state), strict=strict, **kw)

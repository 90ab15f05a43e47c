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


def convert_torch_style_state(state: Mapping) -> Dict[str, np.ndarray]:
    """Normalize a torch/MegEngine flat state dict into HWIO/flax layout
    with FrozenBN-style key names."""
    state = unwarp_ckpt(state)
    out: Dict[str, np.ndarray] = {}
    for key, val in state.items():
        arr = _to_numpy(val)
        k = key.replace(".", "/")
        if arr.ndim == 4 and k.endswith("/weight"):
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


def load_reference_checkpoint(variables: Any, state: Mapping, strict=False):
    """Convert + smart-match a reference-layout checkpoint into ``variables``."""
    return load_matched_weights(
        variables, convert_torch_style_state(state), strict=strict
    )

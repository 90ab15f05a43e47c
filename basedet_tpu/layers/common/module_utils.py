"""Variable-tree surgery: rename, conv+BN fusion for inference.

Capability analogue of /root/reference/basedet/layers/common/module_utils.py:7-36
(rename_module / fuse_model). In JAX, "fusing" means rewriting the variables
pytree: BN's affine+statistics fold into the preceding conv's kernel/bias, and
the BN subtree is replaced by an identity-affine so the same module graph
runs with one less elementwise op per conv (XLA usually fuses these anyway;
the win is checkpoint-size and numerically-frozen inference).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def rename_tree_key(tree: Dict, old: str, new: str) -> Dict:
    """Rename a top-level key path element throughout a nested dict tree."""
    if not isinstance(tree, dict):
        return tree
    return {
        (new if k == old else k): rename_tree_key(v, old, new)
        for k, v in tree.items()
    }


def fuse_conv_bn(
    kernel: np.ndarray,
    bias,
    bn_scale: np.ndarray,
    bn_bias: np.ndarray,
    bn_mean: np.ndarray,
    bn_var: np.ndarray,
    eps: float = 1e-5,
):
    """Fold BN(scale, bias, mean, var) into conv (HWIO kernel, bias).

    y = scale * (conv(x) - mean) / sqrt(var + eps) + bias
      = conv(x) * w' + b'  with  w' = scale/sqrt(var+eps),
        b' = bias - mean * w'.
    """
    w = bn_scale / np.sqrt(bn_var + eps)
    fused_kernel = kernel * w  # broadcast over output-channel (last) axis
    base = bias if bias is not None else 0.0
    fused_bias = (base - bn_mean) * w + bn_bias
    return fused_kernel, fused_bias

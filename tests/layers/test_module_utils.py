"""Variable-tree surgery parity (reference tests/layers/test_module_utils.py:
rename_module keeps outputs identical; fuse_model(conv+BN) == eval output)."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from basedet_tpu.layers.common.module_utils import (
    fuse_conv_bn,
    rename_tree_key,
)


def test_rename_tree_key_preserves_values():
    tree = {"conv1": {"kernel": np.ones((3, 3)), "bias": np.zeros(3)},
            "head": {"conv1": {"w": 1}}}
    out = rename_tree_key(tree, "conv1", "conv2")
    assert "conv2" in out and "conv1" not in out
    assert "conv2" in out["head"]  # renames at every depth
    np.testing.assert_array_equal(out["conv2"]["kernel"], np.ones((3, 3)))


def test_fuse_conv_bn_matches_eval_forward():
    """Folded conv == conv -> eval-mode BN, bit-close (reference
    test_fuse_module with eps kept: fp32 tolerance instead of eps=0)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 10, 3).astype(np.float32))
    kernel = rng.randn(1, 1, 3, 3).astype(np.float32)
    bias = rng.randn(3).astype(np.float32)
    scale = np.abs(rng.randn(3)).astype(np.float32) + 0.5
    beta = rng.randn(3).astype(np.float32)
    mean = rng.randn(3).astype(np.float32)
    var = np.abs(rng.randn(3)).astype(np.float32) + 0.1
    eps = 1e-5

    conv = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    ref = scale * (conv - mean) / np.sqrt(var + eps) + beta

    fk, fb = fuse_conv_bn(kernel, bias, scale, beta, mean, var, eps)
    fused = jax.lax.conv_general_dilated(
        x, jnp.asarray(fk), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + fb
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


def test_fuse_conv_bn_no_bias():
    rng = np.random.RandomState(1)
    kernel = rng.randn(3, 3, 4, 8).astype(np.float32)
    scale = np.ones(8, np.float32)
    beta = np.zeros(8, np.float32)
    mean = rng.randn(8).astype(np.float32)
    var = np.ones(8, np.float32)
    fk, fb = fuse_conv_bn(kernel, None, scale, beta, mean, var, eps=0.0)
    np.testing.assert_allclose(fk, kernel, atol=1e-6)
    np.testing.assert_allclose(fb, -mean, atol=1e-6)

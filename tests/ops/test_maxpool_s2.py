"""max_pool_3x3_s2 fwd/bwd == flax max_pool + jax.grad (incl. tie routing)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from basedet_tpu.ops.maxpool_s2 import max_pool_3x3_s2


def _ref_pool(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


@pytest.mark.parametrize("H,W", [(16, 16), (17, 19), (8, 12)])
def test_forward_matches(H, W):
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, H, W, 5).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3_s2(x)), np.asarray(_ref_pool(x)))


@pytest.mark.parametrize("H,W", [(16, 16), (17, 19), (8, 12)])
def test_grad_matches_no_ties(H, W):
    x = jnp.asarray(
        np.random.RandomState(1).randn(2, H, W, 5).astype(np.float32))
    g_ref = jax.grad(lambda x: (_ref_pool(x) ** 2).sum())(x)
    g_sub = jax.grad(lambda x: (max_pool_3x3_s2(x) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_sub), np.asarray(g_ref),
                               atol=1e-6)


def test_grad_matches_with_ties():
    """Integer-valued inputs force equal-max windows: tie must route to the
    same (first, row-major) position XLA's SelectAndScatter picks."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randint(0, 3, (2, 12, 12, 3)).astype(np.float32))
    dy = jnp.asarray(rng.randn(2, 6, 6, 3).astype(np.float32))
    g_ref = jax.vjp(_ref_pool, x)[1](dy)[0]
    g_sub = jax.vjp(max_pool_3x3_s2, x)[1](dy)[0]
    np.testing.assert_allclose(np.asarray(g_sub), np.asarray(g_ref),
                               atol=1e-6)


def test_bf16():
    x = jnp.asarray(np.random.RandomState(3).randn(1, 10, 10, 4)
                    .astype(np.float32), jnp.bfloat16)
    y = max_pool_3x3_s2(x)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(y, np.float32), np.asarray(_ref_pool(x), np.float32))
    g = jax.grad(lambda x: max_pool_3x3_s2(x).astype(jnp.float32).sum())(x)
    assert g.dtype == jnp.bfloat16

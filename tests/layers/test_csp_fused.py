"""csp_layer_fused (interpret-mode Pallas) vs the production flax
CSPLayer with IDENTICAL weights — output activations and BN batch
moments must agree (up to documented bf16/variance-formula drift)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basedet_tpu.layers.blocks.csp_fused import (
    csp_layer_fused,
    flax_csp_params_to_fused,
)
from basedet_tpu.layers.blocks.yolo_block import CSPLayer


@pytest.mark.parametrize("n,shortcut", [(1, True), (2, True), (1, False)])
def test_matches_flax_csp(n, shortcut):
    B, H, W, C = 2, 16, 16, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C) * 0.5, jnp.bfloat16)

    layer = CSPLayer(out_channels=C, n=n, shortcut=shortcut, train=True)
    variables = layer.init(jax.random.PRNGKey(0), x)

    ref, mut = layer.apply(x=x, variables=variables, mutable=["batch_stats"])

    p = flax_csp_params_to_fused(variables, n)
    out, moments = csp_layer_fused(
        p, x, n, shortcut=shortcut, interpret=True
    )

    assert out.shape == ref.shape
    a = np.asarray(out, np.float32)
    b = np.asarray(ref, np.float32)
    # bf16 activations; elementwise agreement within a couple of ulps
    np.testing.assert_allclose(a, b, atol=0.05, rtol=0.05)
    assert float(np.abs(a - b).mean()) < 5e-3

    # batch moments: fused sums vs flax's mean/var (E[y^2]-E[y]^2 drift)
    new_means = mut["batch_stats"]
    # flax running update: new = mom*old + (1-mom)*batch; old mean=0, var=1
    mom = 0.97
    batch_mean_c1 = np.asarray(new_means["conv1"]["BatchNorm_0"]["mean"]) / (
        1 - mom
    )
    np.testing.assert_allclose(
        np.asarray(moments["conv1"][0]), batch_mean_c1, atol=1e-3, rtol=1e-3
    )


def test_moment_keys_complete():
    B, H, W, C, n = 1, 8, 8, 16, 2
    x = jnp.zeros((B, H, W, C), jnp.bfloat16)
    layer = CSPLayer(out_channels=C, n=n, train=True)
    variables = layer.init(jax.random.PRNGKey(0), x)
    p = flax_csp_params_to_fused(variables, n)
    _, moments = csp_layer_fused(p, x, n, interpret=True)
    assert set(moments) == {
        "conv1", "conv2", "m0a", "m0b", "m1a", "m1b", "conv3"
    }

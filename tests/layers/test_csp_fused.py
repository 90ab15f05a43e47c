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


def test_pafpn_reduce_shape():
    """out_channels != in_channels, shortcut=False (the PAFPN C3 reduce
    layers) — round-4 regression: the fused path reshaped the output to
    the INPUT channel count."""
    B, H, W, Cin, Cout, n = 2, 8, 8, 64, 32, 1
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, H, W, Cin) * 0.5, jnp.bfloat16)
    layer = CSPLayer(out_channels=Cout, n=n, shortcut=False, train=True)
    variables = layer.init(jax.random.PRNGKey(0), x)
    ref, _ = layer.apply(x=x, variables=variables, mutable=["batch_stats"])
    p = flax_csp_params_to_fused(variables, n)
    out, _ = csp_layer_fused(p, x, n, shortcut=False, interpret=True)
    assert out.shape == ref.shape == (B, H, W, Cout)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )


def test_grad_through_fused_layer():
    """value_and_grad through the FULL fused layer (interpret mode) — the
    round-4 verify run caught a mixed-dtype transpose-conv crash that
    forward-only tests miss; grads must also match the flax layer's."""
    B, H, W, C, n = 2, 8, 8, 32, 1
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, H, W, C) * 0.5, jnp.bfloat16)
    layer = CSPLayer(out_channels=C, n=n, shortcut=True, train=True)
    variables = layer.init(jax.random.PRNGKey(0), x)
    p = flax_csp_params_to_fused(variables, n)

    def loss_fused(p):
        out, _ = csp_layer_fused(p, x, n, shortcut=True, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_flax(params):
        out, _ = layer.apply(
            x=x, variables={**variables, "params": params},
            mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    v1, g1 = jax.value_and_grad(loss_fused)(p)
    v2, g2 = jax.value_and_grad(loss_flax)(variables["params"])
    np.testing.assert_allclose(float(v1), float(v2), rtol=0.02)
    g2f = flax_csp_params_to_fused({"params": g2}, n)
    for k in g1:
        a, b = np.asarray(g1[k], np.float32), np.asarray(g2f[k], np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=0.06)


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


def test_cspLayer_fused_branch_param_tree_compatible(monkeypatch):
    """Init through the STANDARD branch, apply through the FUSED branch —
    the holder modules must hit the exact same param/batch_stats tree, and
    outputs must agree with the standard path on the same weights."""
    import os

    from basedet_tpu.layers.precision import precision_policy

    B, H, W, C, n = 2, 16, 16, 32, 1
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, H, W, C) * 0.5, jnp.bfloat16)

    with precision_policy(jnp.bfloat16):
        layer = CSPLayer(out_channels=C, n=n, shortcut=True, train=True)
        variables = layer.init(jax.random.PRNGKey(0), x)  # standard branch
        ref, mut_ref = layer.apply(
            x=x, variables=variables, mutable=["batch_stats"]
        )

        monkeypatch.setenv("BASEDET_FUSED_BN", "1")
        monkeypatch.setenv("BASEDET_FUSED_BN_INTERPRET", "1")
        out, mut = layer.apply(
            x=x, variables=variables, mutable=["batch_stats"]
        )

    a, b = np.asarray(out, np.float32), np.asarray(ref, np.float32)
    np.testing.assert_allclose(a, b, atol=0.05, rtol=0.05)
    assert float(np.abs(a - b).mean()) < 5e-3

    # running stats updated with the same momentum rule
    ra = np.asarray(mut["batch_stats"]["conv1"]["BatchNorm_0"]["mean"])
    rb = np.asarray(mut_ref["batch_stats"]["conv1"]["BatchNorm_0"]["mean"])
    np.testing.assert_allclose(ra, rb, atol=1e-3)

    # fused-branch init produces the identical tree (either order works)
    monkeypatch.setenv("BASEDET_FUSED_BN", "1")
    v2 = layer.init(jax.random.PRNGKey(0), x)
    t1 = jax.tree_util.tree_structure(variables)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2
    for (p1, a1), (p2, a2) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(v2),
    ):
        assert p1 == p2
        assert a1.shape == a2.shape and a1.dtype == a2.dtype

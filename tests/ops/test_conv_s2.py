"""conv2d_s2 custom-VJP == jax.grad of the plain stride-2 conv."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basedet_tpu.ops.conv_s2 import conv2d_s2


@pytest.mark.parametrize("k,p,H,ci,co", [
    (3, 1, 16, 4, 8),    # CSP downsample
    (3, 1, 17, 4, 8),    # odd input
    (6, 2, 20, 3, 8),    # fused Focus stem
    (7, 3, 18, 3, 8),    # ResNet stem
    (1, 0, 12, 4, 8),    # ResNet 1x1/2 downsample (odd parities get 0 grad)
])
def test_grads_match_plain_conv(k, p, H, ci, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, H, H + 2, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.1)

    def ref(x, w):
        return jnp.sum(jax.lax.conv_general_dilated(
            x, w, (2, 2), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) ** 2)

    def sub(x, w):
        return jnp.sum(conv2d_s2(x, w, (p, p)) ** 2)

    np.testing.assert_allclose(
        np.asarray(sub(x, w)), np.asarray(ref(x, w)), rtol=1e-5)
    gx_r, gw_r = jax.grad(ref, argnums=(0, 1))(x, w)
    gx_s, gw_s = jax.grad(sub, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_r),
                               atol=1e-4, rtol=1e-4)


def test_bf16_path():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32), jnp.bfloat16)
    y = conv2d_s2(x, w, (1, 1))
    assert y.dtype == jnp.bfloat16 and y.shape == (1, 4, 4, 8)
    g = jax.grad(lambda x: conv2d_s2(x, w, (1, 1)).astype(jnp.float32).sum())(x)
    assert g.dtype == jnp.bfloat16 and g.shape == x.shape


def test_s2conv_module_drop_in(monkeypatch):
    """precision.Conv stride-2 dispatch: S2Conv param tree and outputs match
    nn.Conv exactly (same init rngs); grads match too."""
    from flax import linen as nn
    monkeypatch.setenv("BASEDET_S2_DGRAD", "subpix")
    from basedet_tpu.layers import precision

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))

    ref_mod = nn.Conv(8, (3, 3), (2, 2), padding=1, use_bias=True)
    sub_mod = precision.Conv(8, (3, 3), (2, 2), padding=1, use_bias=True)
    assert type(sub_mod).__name__ == "S2Conv"

    v_ref = ref_mod.init(jax.random.PRNGKey(7), x)
    v_sub = sub_mod.init(jax.random.PRNGKey(7), x)
    assert jax.tree_util.tree_structure(v_ref) == \
        jax.tree_util.tree_structure(v_sub)
    for a, b in zip(jax.tree_util.tree_leaves(v_ref),
                    jax.tree_util.tree_leaves(v_sub)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    y_ref = ref_mod.apply(v_ref, x)
    y_sub = sub_mod.apply(v_ref, x)  # same variables
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_ref),
                               atol=1e-5)

    g_ref = jax.grad(lambda v: (ref_mod.apply(v, x) ** 2).sum())(v_ref)
    g_sub = jax.grad(lambda v: (sub_mod.apply(v, x) ** 2).sum())(v_ref)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sub)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_s2conv_1x1_same_padding_equivalence(monkeypatch):
    """1x1/s2 with flax default 'SAME' == S2Conv pad 0 (downsample convs)."""
    from flax import linen as nn
    monkeypatch.setenv("BASEDET_S2_DGRAD", "subpix")
    from basedet_tpu.layers import precision

    for H in (16, 17):
        x = jnp.asarray(
            np.random.RandomState(4).randn(1, H, H, 4).astype(np.float32))
        ref_mod = nn.Conv(6, (1, 1), (2, 2), use_bias=False)
        sub_mod = precision.Conv(6, (1, 1), (2, 2), use_bias=False)
        assert type(sub_mod).__name__ == "S2Conv"
        v = ref_mod.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(sub_mod.apply(v, x)), np.asarray(ref_mod.apply(v, x)),
            atol=1e-6)


def test_s2conv_dispatch_defeated_by_unhandled_kwargs(monkeypatch):
    """kwargs S2Conv can't forward (param_dtype, precision, ...) must defeat
    the dispatch (fall through to nn.Conv), not be silently dropped."""
    monkeypatch.setenv("BASEDET_S2_DGRAD", "subpix")
    import jax.lax

    from basedet_tpu.layers import precision

    mod = precision.Conv(8, (3, 3), (2, 2), padding=1,
                         param_dtype=jnp.bfloat16)
    assert type(mod).__name__ == "Conv"
    assert mod.param_dtype == jnp.bfloat16
    mod2 = precision.Conv(8, (3, 3), (2, 2), padding=1,
                          precision=jax.lax.Precision.HIGHEST)
    assert type(mod2).__name__ == "Conv"


def test_subpix_wgrad_matches(monkeypatch):
    monkeypatch.setenv("BASEDET_S2_WGRAD", "subpix")
    rng = np.random.RandomState(5)
    for k, p, H in [(3, 1, 14), (6, 2, 20), (1, 0, 12), (7, 3, 18)]:
        x = jnp.asarray(rng.randn(2, H, H + 2, 3).astype(np.float32))
        w = jnp.asarray(rng.randn(k, k, 3, 5).astype(np.float32) * 0.1)

        def ref(w):
            return jnp.sum(jax.lax.conv_general_dilated(
                x, w, (2, 2), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2)

        def sub(w):
            return jnp.sum(conv2d_s2(x, w, (p, p)) ** 2)

        gw_r = jax.grad(ref)(w)
        gw_s = jax.grad(sub)(w)
        np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_r),
                                   atol=1e-4, rtol=1e-4)

"""Space-to-depth stem convs == the plain stride-2 convs they replace.

Round-3 perf change (playground/probe_stems.py): the R50 7x7/s2 stem and
the YOLOX Focus conv run as dense stride-1 convs on the space-to-depth
packing. These must be drop-in: identical param trees and (up to f32
summation order) identical outputs.
"""
import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.models.cls.resnet import _S2DStemConv


def _plain(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_r50_stem_s2d_equals_plain():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    mod = _S2DStemConv()
    v = mod.init(jax.random.PRNGKey(0), x)
    assert v["params"]["kernel"].shape == (7, 7, 3, 64)
    got = mod.apply(v, x)
    want = _plain(x, v["params"]["kernel"])
    assert got.shape == want.shape == (2, 32, 32, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_r50_stem_odd_input_fallback():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 63, 63, 3), jnp.float32)
    mod = _S2DStemConv()
    v = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(v, x)
    want = jax.lax.conv_general_dilated(
        x, v["params"]["kernel"], (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_r50_stem_grads_match():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    mod = _S2DStemConv()
    v = mod.init(jax.random.PRNGKey(0), x)
    w = v["params"]["kernel"]

    gx_s, gw_s = jax.grad(
        lambda x, w: (mod.apply({"params": {"kernel": w}}, x) ** 2).sum(),
        argnums=(0, 1))(x, w)
    gx_p, gw_p = jax.grad(
        lambda x, w: (_plain(x, w) ** 2).sum(), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_p),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_p),
                               rtol=1e-4, atol=1e-4)

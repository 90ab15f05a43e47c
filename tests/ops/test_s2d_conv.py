"""Space-to-depth packed stride-2 conv == lax stride-2 conv, for every
backbone geometry (3x3p1, 1x1p0, 6x6p2 stem, 7x7p3 stem), values and grads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basedet_tpu.ops.s2d_conv import (
    pack_s2_kernel,
    packed_geometry,
    s2d_conv,
    space_to_depth,
)

GEOMS = [
    (3, 1, 16, 8, 12),   # CSP/resnet downsample
    (1, 0, 16, 8, 12),   # 1x1 shortcut downsample
    (6, 2, 32, 12, 8),   # fused-Focus YOLOX stem
    (7, 3, 32, 3, 8),    # resnet stem
    (3, 1, 18, 8, 12),   # odd spatial handling comes from even-H only rule
]


def ref_conv(x, w, p):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("k,p,H,ci,co", GEOMS)
def test_forward_matches(k, p, H, ci, co):
    if H % 2:
        pytest.skip("packing requires even H")
    rng = np.random.RandomState(k * 100 + p)
    x = jnp.asarray(rng.randn(2, H, H + 2 if (H + 2) % 2 == 0 else H, ci)
                    .astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.1)
    got = s2d_conv(x, w, p)
    ref = ref_conv(x, w, p)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,p,H,ci,co", GEOMS[:4])
def test_grads_match(k, p, H, ci, co):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, H, H, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.1)

    gx1, gw1 = jax.grad(lambda x, w: (s2d_conv(x, w, p) ** 2).sum(),
                        argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(lambda x, w: (ref_conv(x, w, p) ** 2).sum(),
                        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-4, atol=1e-4)


def test_space_to_depth_phase_order():
    x = jnp.arange(1 * 4 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 4, 1)
    xp = space_to_depth(x)
    assert xp.shape == (1, 2, 2, 4)
    # packed pixel (0,0) = original rows 0-1, cols 0-1, phases 00,01,10,11
    np.testing.assert_array_equal(np.asarray(xp[0, 0, 0]), [0, 1, 4, 5])


def test_pack_kernel_tap_placement():
    # k=3, p=1 → shift 1, ka=2: tap (a=0, da=1) holds w row 0, (1,0)→1, (1,1)→2
    ci, co = 2, 3
    w = jnp.arange(3 * 3 * ci * co, dtype=jnp.float32).reshape(3, 3, ci, co)
    wp = pack_s2_kernel(w, 1).reshape(2, 2, 2, 2, ci, co)  # (a,b,da,db,C,Co)
    assert packed_geometry(3, 1) == (2, 1)
    np.testing.assert_array_equal(np.asarray(wp[0, 0, 0, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(wp[0, 1, 1, 0]), np.asarray(w[0, 1]))
    np.testing.assert_array_equal(np.asarray(wp[1, 1, 0, 1]), np.asarray(w[1, 2]))
    np.testing.assert_array_equal(np.asarray(wp[1, 1, 1, 1]), np.asarray(w[2, 2]))


def test_bf16_path():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    got = s2d_conv(x, w, 1)
    ref = ref_conv(x, w, 1)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )

"""Block-gather bilinear sampler (DCN core) vs the literal per-corner
zero-padded formulation, across inside/edge/outside coordinates."""
import jax.numpy as jnp
import numpy as np

from basedet_tpu.layers.blocks.deformable import _bilinear_sample


def oracle(img, y, x):
    H, W, _ = img.shape
    y0 = np.floor(y)
    x0 = np.floor(x)
    wy = y - y0
    wx = x - x0

    def tap(yy, xx):
        inside = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        v = img[np.clip(yy, 0, H - 1).astype(int),
                np.clip(xx, 0, W - 1).astype(int)]
        return np.where(inside[..., None], v, 0.0)

    return (
        tap(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
        + tap(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
        + tap(y0 + 1, x0) * (wy * (1 - wx))[..., None]
        + tap(y0 + 1, x0 + 1) * (wy * wx)[..., None]
    )


def test_block_sampler_matches_per_corner_oracle():
    rng = np.random.RandomState(0)
    img = rng.randn(13, 17, 5).astype(np.float32)
    y = rng.uniform(-4, 17, (300,)).astype(np.float32)
    x = rng.uniform(-4, 21, (300,)).astype(np.float32)
    got = np.asarray(_bilinear_sample(jnp.asarray(img), jnp.asarray(y),
                                      jnp.asarray(x)))
    np.testing.assert_allclose(got, oracle(img, y, x), atol=1e-5)


def test_block_sampler_integer_and_boundary_coords():
    rng = np.random.RandomState(1)
    img = rng.randn(13, 17, 5).astype(np.float32)
    y = np.array([0.0, 12.0, -1.0, 13.0, -0.5, 12.5], np.float32)
    x = np.array([0.0, 16.0, -1.0, 17.0, 16.5, -0.5], np.float32)
    got = np.asarray(_bilinear_sample(jnp.asarray(img), jnp.asarray(y),
                                      jnp.asarray(x)))
    np.testing.assert_allclose(got, oracle(img, y, x), atol=1e-5)

"""Separable-matmul RoIAlign vs the gather formulation (the golden-tested
oracle) on identical inputs, including level-assignment edge cases."""
import jax.numpy as jnp
import numpy as np

from basedet_tpu.ops.roi_align import multilevel_roi_align, roi_align
from basedet_tpu.ops.roi_align_separable import multilevel_roi_align_batched


def _random_rois(rng, B, R, img=256):
    xy = rng.rand(B, R, 2) * (img - 20)
    wh = rng.rand(B, R, 2) * (img / 2) + 4
    return np.concatenate([xy, np.minimum(xy + wh, img)], axis=-1).astype(
        np.float32
    )


def test_separable_matches_gather_multilevel():
    rng = np.random.RandomState(0)
    B, R, C = 2, 17, 8
    sizes = [(64, 64), (32, 32), (16, 16), (8, 8)]
    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)) for h, w in sizes
    ]
    rois = _random_rois(rng, B, R)

    got = multilevel_roi_align_batched(
        feats, jnp.asarray(rois), strides, (7, 7)
    )  # (B, R, 7, 7, C)

    flat = np.concatenate(
        [
            np.repeat(np.arange(B), R).astype(np.float32)[:, None],
            rois.reshape(-1, 4),
        ],
        axis=1,
    )
    ref = multilevel_roi_align(feats, jnp.asarray(flat), strides, (7, 7))
    np.testing.assert_allclose(
        np.asarray(got).reshape(-1, 7, 7, C),
        np.asarray(ref),
        rtol=1e-5,
        atol=1e-5,
    )


def test_separable_single_level_vs_roi_align():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    rois = np.asarray([[[1.0, 2.0, 50.0, 40.0], [0.0, 0.0, 60.0, 60.0]]],
                      np.float32)
    got = multilevel_roi_align_batched([feat], jnp.asarray(rois), (4,), (7, 7))
    flat = jnp.asarray(
        [[0, 1, 2, 50, 40], [0, 0, 0, 60, 60]], jnp.float32
    )
    ref = roi_align(feat, flat, 0.25, (7, 7))
    np.testing.assert_allclose(
        np.asarray(got)[0], np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_separable_out_of_range_and_degenerate():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    rois = np.asarray(
        [
            [
                [-40.0, -40.0, 10.0, 10.0],  # partially out of range
                [0.0, 0.0, 0.0, 0.0],        # zero-area
                [30.0, 30.0, 31.0, 31.0],    # tiny
            ]
        ],
        np.float32,
    )
    got = multilevel_roi_align_batched([feat], jnp.asarray(rois), (4,), (2, 2))
    flat = jnp.concatenate(
        [jnp.zeros((3, 1)), jnp.asarray(rois[0])], axis=1
    )
    ref = roi_align(feat, flat, 0.25, (2, 2))
    np.testing.assert_allclose(
        np.asarray(got)[0], np.asarray(ref), rtol=1e-5, atol=1e-6
    )

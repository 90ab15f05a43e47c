"""Pallas pairwise IoU kernel vs the jnp reference (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from basedet_tpu.ops.iou_pallas import box_iou_pallas
from basedet_tpu.structures import box_iou


def random_boxes(rng, n, size=200.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 3, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_pallas_iou_matches_jnp():
    rng = np.random.RandomState(0)
    b1 = jnp.asarray(random_boxes(rng, 300))
    b2 = jnp.asarray(random_boxes(rng, 130))
    got = box_iou_pallas(b1, b2, interpret=True)
    expected = box_iou(b1, b2)
    assert got.shape == (300, 130)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-6)

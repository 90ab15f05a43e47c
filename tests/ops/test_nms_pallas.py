"""Pallas NMS kernel (interpret mode) vs the XLA formulation and the
greedy oracle."""
import jax.numpy as jnp
import numpy as np

from basedet_tpu.ops.nms_pallas import nms_keep_pallas

from .test_nms import greedy_nms_oracle, random_boxes


def test_pallas_nms_matches_oracle_multitile():
    rng = np.random.RandomState(7)
    n = 600
    boxes = random_boxes(rng, n, size=300.0)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    order = np.argsort(-scores)
    sorted_boxes = boxes[order]
    valid = np.ones(n, bool)

    keep = np.asarray(
        nms_keep_pallas(
            jnp.asarray(sorted_boxes), jnp.asarray(valid), 0.5, interpret=True
        )
    )
    expected_orig_idx = greedy_nms_oracle(boxes, scores, 0.5)
    expected_sorted_pos = sorted(
        np.where(np.isin(order, expected_orig_idx))[0]
    )
    got = np.where(keep)[0].tolist()
    np.testing.assert_array_equal(got, expected_sorted_pos)


def test_pallas_nms_respects_validity():
    rng = np.random.RandomState(8)
    boxes = random_boxes(rng, 40)
    valid = np.asarray([True] * 25 + [False] * 15)
    keep = np.asarray(
        nms_keep_pallas(jnp.asarray(boxes), jnp.asarray(valid), 0.5,
                        interpret=True)
    )
    assert not keep[25:].any()

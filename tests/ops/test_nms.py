"""NMS vs a numpy greedy oracle (reference py_cpu_nms semantics,
post_processing.py:106-132)."""
import jax.numpy as jnp
import numpy as np

from basedet_tpu.ops import NEG_INF, batched_nms_padded, nms_padded


def greedy_nms_oracle(boxes, scores, thresh):
    """Sequential greedy NMS, returns kept indices score-descending."""
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        order = order[1:]
        xx1 = np.maximum(x1[i], x1[order])
        yy1 = np.maximum(y1[i], y1[order])
        xx2 = np.minimum(x2[i], x2[order])
        yy2 = np.minimum(y2[i], y2[order])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[order] - inter, 1e-12)
        order = order[iou <= thresh]
    return keep


def random_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 3, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_nms_matches_oracle_small():
    rng = np.random.RandomState(0)
    boxes = random_boxes(rng, 60)
    scores = rng.uniform(0.01, 1.0, 60).astype(np.float32)
    expected = greedy_nms_oracle(boxes, scores, 0.5)
    idx, _, _, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 60)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, expected)


def test_nms_matches_oracle_multitile():
    # exceed one 256-tile so the cross-tile path is exercised
    rng = np.random.RandomState(1)
    n = 700
    boxes = random_boxes(rng, n, size=300.0)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    expected = greedy_nms_oracle(boxes, scores, 0.5)[:100]
    idx, _, _, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 100)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, expected)


def test_nms_with_padding_entries():
    rng = np.random.RandomState(2)
    boxes = random_boxes(rng, 40)
    scores = rng.uniform(0.01, 1.0, 40).astype(np.float32)
    padded_boxes = np.concatenate([boxes, np.zeros((24, 4), np.float32)])
    padded_scores = np.concatenate(
        [scores, np.full((24,), NEG_INF, np.float32)]
    )
    expected = greedy_nms_oracle(boxes, scores, 0.3)[:10]
    idx, _, out_scores, valid = nms_padded(
        jnp.asarray(padded_boxes), jnp.asarray(padded_scores), 0.3, 10
    )
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, expected)
    # scores come back sorted descending
    s = np.asarray(out_scores)[np.asarray(valid)]
    assert np.all(np.diff(s) <= 0)


def test_nms_max_output_truncates():
    rng = np.random.RandomState(3)
    boxes = random_boxes(rng, 50, size=1000.0)  # mostly disjoint
    scores = rng.uniform(0.01, 1.0, 50).astype(np.float32)
    expected = greedy_nms_oracle(boxes, scores, 0.5)
    assert len(expected) > 5
    idx, _, _, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 5)
    assert np.asarray(valid).sum() == 5
    np.testing.assert_array_equal(np.asarray(idx), expected[:5])


def test_batched_nms_classes_dont_suppress_each_other():
    boxes = np.array(
        [[0, 0, 10, 10], [0, 0, 10, 10], [0, 0, 10, 10]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idxs = np.array([0, 1, 0], np.int32)
    idx, out_boxes, _, valid = batched_nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), 0.5, 10
    )
    kept = np.asarray(idx)[np.asarray(valid)]
    # identical boxes: class 0 keeps only the best; class 1 survives
    np.testing.assert_array_equal(sorted(kept.tolist()), [0, 1])
    # returned boxes are un-offset originals
    np.testing.assert_allclose(
        np.asarray(out_boxes)[np.asarray(valid)], boxes[kept]
    )

"""Golden-value tests for box math (model: reference tests/structures/test_boxes.py)."""
import jax.numpy as jnp
import numpy as np

from basedet_tpu.structures import (
    BoxCoder,
    PointCoder,
    SumBoxCoder,
    box_area,
    box_center,
    box_giou,
    box_ioa,
    box_iou,
    clip_boxes,
    convert_boxes,
    elementwise_iou,
    nonempty_mask,
    pairwise_intersection,
    point_distance,
    scale_boxes,
)

B1 = jnp.array(
    [
        [0.0, 0.0, 10.0, 10.0],
        [0.0, 0.0, 5.0, 5.0],
        [2.0, 2.0, 8.0, 8.0],
    ]
)
B2 = jnp.array(
    [
        [0.0, 0.0, 10.0, 10.0],
        [5.0, 5.0, 15.0, 15.0],
    ]
)


def test_area_center():
    np.testing.assert_allclose(box_area(B1), [100.0, 25.0, 36.0])
    np.testing.assert_allclose(box_center(B2), [[5.0, 5.0], [10.0, 10.0]])


def test_pairwise_intersection():
    inter = pairwise_intersection(B1, B2)
    # hand-computed intersection areas
    expected = np.array([[100.0, 25.0], [25.0, 0.0], [36.0, 9.0]])
    np.testing.assert_allclose(inter, expected)


def test_iou():
    iou = box_iou(B1, B2)
    expected = np.array(
        [
            [1.0, 25.0 / 175.0],
            [25.0 / 100.0, 0.0],
            [36.0 / 100.0, 9.0 / 127.0],
        ]
    )
    np.testing.assert_allclose(iou, expected, rtol=1e-6)


def test_ioa():
    ioa = box_ioa(B1, B2)
    expected = np.array(
        [[1.0, 0.25], [0.25, 0.0], [0.36, 0.09]]
    )
    np.testing.assert_allclose(ioa, expected, rtol=1e-6)


def test_giou_matches_iou_when_nested():
    # when one box encloses the other, enclosing box == union ⇒ giou == iou
    g = box_giou(B1[:1], B1[1:2])
    i = box_iou(B1[:1], B1[1:2])
    np.testing.assert_allclose(g, i, rtol=1e-6)


def test_giou_disjoint_negative():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[2.0, 2.0, 3.0, 3.0]])
    g = box_giou(a, b)[0, 0]
    # iou = 0, enclose = 9, union = 2 → giou = -(9-2)/9
    np.testing.assert_allclose(g, -7.0 / 9.0, rtol=1e-6)


def test_elementwise_iou():
    e = elementwise_iou(B1[:2], B2)
    np.testing.assert_allclose(e, [1.0, 0.0], atol=1e-7)


def test_point_distance():
    pts = jnp.array([[5.0, 5.0], [0.0, 0.0]])
    d = point_distance(pts, B2)
    # point (5,5) vs box2 (5,5,15,15): l=0 t=0 r=10 b=10
    np.testing.assert_allclose(d[0, 1], [0.0, 0.0, 10.0, 10.0])
    # point (0,0) vs box1 (0,0,10,10): l=0 t=0 r=10 b=10
    np.testing.assert_allclose(d[1, 0], [0.0, 0.0, 10.0, 10.0])


def test_clip_scale_nonempty():
    b = jnp.array([[-5.0, -5.0, 20.0, 20.0], [3.0, 3.0, 3.0, 9.0]])
    np.testing.assert_allclose(clip_boxes(b, (10, 12))[0], [0, 0, 12, 10])
    np.testing.assert_allclose(
        scale_boxes(b, 2.0, 0.5)[0], [-10.0, -2.5, 40.0, 10.0]
    )
    np.testing.assert_array_equal(nonempty_mask(b), [True, False])


def test_convert_roundtrip():
    b = jnp.array([[2.0, 3.0, 8.0, 11.0]])
    xywh = convert_boxes(b, "xyxy", "xywh")
    np.testing.assert_allclose(xywh, [[2, 3, 6, 8]])
    cc = convert_boxes(b, "xyxy", "xcycwh")
    np.testing.assert_allclose(cc, [[5, 7, 6, 8]])
    back = convert_boxes(cc, "xcycwh", "xyxy")
    np.testing.assert_allclose(back, b)


def test_boxcoder_roundtrip():
    coder = BoxCoder(reg_mean=(0.1, 0.2, 0.0, 0.0), reg_std=(1.0, 1.0, 2.0, 2.0))
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 9.0, 13.0]])
    gt = jnp.array([[1.0, 2.0, 11.0, 9.0], [4.0, 4.0, 10.0, 12.0]])
    deltas = coder.encode(anchors, gt)
    rec = coder.decode(anchors, deltas)
    np.testing.assert_allclose(rec, gt, rtol=1e-4, atol=1e-3)


def test_sum_coder_roundtrip():
    coder = SumBoxCoder(reg_std=(2.0, 2.0, 2.0, 2.0))
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    gt = jnp.array([[1.0, 2.0, 11.0, 9.0]])
    np.testing.assert_allclose(
        coder.decode(anchors, coder.encode(anchors, gt)), gt, rtol=1e-6
    )


def test_point_coder_roundtrip():
    coder = PointCoder()
    pts = jnp.array([[5.0, 5.0], [3.0, 4.0]])
    gt = jnp.array([[1.0, 2.0, 11.0, 9.0], [0.0, 0.0, 6.0, 8.0]])
    deltas = coder.encode(pts, gt)
    np.testing.assert_allclose(deltas[0], [4.0, 3.0, 6.0, 4.0])
    np.testing.assert_allclose(coder.decode(pts, deltas), gt)

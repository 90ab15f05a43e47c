"""Pre/post-processing behavior (models: reference tests/layers/
test_preprocess.py + test_postprocess.py)."""
import jax.numpy as jnp
import numpy as np

from basedet_tpu.layers.common.post_processing import post_processing
from basedet_tpu.layers.common.pre_processing import (
    data_to_input,
    get_multiple_size,
    get_padded_tensor,
    normalize_image,
)
from basedet_tpu.ops.nms import NEG_INF


def test_get_multiple_size():
    assert get_multiple_size(1) == 32
    assert get_multiple_size(32) == 32
    assert get_multiple_size(33) == 64
    assert get_multiple_size(800) == 800
    assert get_multiple_size(801) == 832


def test_get_padded_tensor():
    x = jnp.ones((2, 30, 50, 3))
    padded = get_padded_tensor(x, 32, pad_value=0.0)
    assert padded.shape == (2, 32, 64, 3)
    np.testing.assert_allclose(padded[:, :30, :50], 1.0)
    np.testing.assert_allclose(padded[:, 30:, :], 0.0)
    np.testing.assert_allclose(padded[:, :, 50:], 0.0)


def test_normalize_image_bgr_stats():
    mean = [103.53, 116.28, 123.675]
    std = [57.375, 57.12, 58.395]
    img = jnp.broadcast_to(jnp.asarray(mean), (1, 4, 4, 3))
    out = normalize_image(img, mean, std)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


def test_data_to_input_pads_and_normalizes():
    img = jnp.full((1, 31, 31, 3), 100.0)
    out = data_to_input(img, mean=[100, 100, 100], std=[10, 10, 10])
    assert out.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out)[0, :31, :31], 0.0, atol=1e-6)
    # padding was zero pixels → normalized to -10
    np.testing.assert_allclose(np.asarray(out)[0, 31, 31], -10.0, atol=1e-5)


def test_post_processing_rescale_and_clip():
    # network-input coords on a 100x100 image that was originally 200x400
    boxes = jnp.asarray(
        [[10, 10, 50, 50], [90, 90, 120, 130]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8], jnp.float32)
    labels = jnp.asarray([0, 1], jnp.int32)
    img_info = jnp.asarray([100, 100, 200, 400, 2], jnp.float32)
    out_boxes, out_scores, out_labels, valid = post_processing(
        boxes, scores, labels, img_info, iou_threshold=0.5, max_detections=5
    )
    assert bool(valid[0]) and bool(valid[1])
    # scale_x = 400/100 = 4, scale_y = 200/100 = 2
    np.testing.assert_allclose(np.asarray(out_boxes[0]), [40, 20, 200, 100])
    # second box clips to (orig_h=200, orig_w=400)
    np.testing.assert_allclose(np.asarray(out_boxes[1]), [360, 180, 400, 200])
    assert int(out_labels[0]) == 0 and int(out_labels[1]) == 1


def test_post_processing_drops_padding_candidates():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.float32)
    scores = jnp.asarray([0.9, NEG_INF], jnp.float32)
    labels = jnp.asarray([3, 0], jnp.int32)
    img_info = jnp.asarray([100, 100, 100, 100, 1], jnp.float32)
    _, out_scores, out_labels, valid = post_processing(
        boxes, scores, labels, img_info, 0.5, 4
    )
    assert int(np.asarray(valid).sum()) == 1
    assert int(out_labels[0]) == 3

"""RoIAlign golden tests (model: reference tests/layers/test_roi_pool.py —
arange feature map values + scale invariance)."""
import jax.numpy as jnp
import numpy as np

from basedet_tpu.ops import multilevel_roi_align, roi_align


def roi_align_oracle(feat_hw, roi, out_size, scale, sampling_ratio=2):
    """Naive numpy roi_align (aligned=True, average) on a (H, W) map."""
    H, W = feat_hw.shape
    ph, pw = out_size
    x1, y1, x2, y2 = [c * scale - 0.5 for c in roi]
    bin_h = (y2 - y1) / ph
    bin_w = (x2 - x1) / pw
    out = np.zeros((ph, pw))

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return 0.0
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1_, x1_ = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return (
            feat_hw[y0, x0] * (1 - ly) * (1 - lx)
            + feat_hw[y0, x1_] * (1 - ly) * lx
            + feat_hw[y1_, x0] * ly * (1 - lx)
            + feat_hw[y1_, x1_] * ly * lx
        )

    S = sampling_ratio
    for i in range(ph):
        for j in range(pw):
            acc = 0.0
            for sy in range(S):
                for sx in range(S):
                    y = y1 + (i + (sy + 0.5) / S) * bin_h
                    x = x1 + (j + (sx + 0.5) / S) * bin_w
                    acc += bilinear(y, x)
            out[i, j] = acc / (S * S)
    return out


def test_roi_align_matches_oracle():
    H, W = 5, 5
    feat = np.arange(H * W, dtype=np.float32).reshape(H, W)
    feats = jnp.asarray(feat)[None, :, :, None]  # (1, H, W, 1)
    roi = [1.0, 1.0, 4.0, 4.0]
    rois = jnp.asarray([[0.0] + roi], jnp.float32)
    got = roi_align(feats, rois, spatial_scale=1.0, output_size=(2, 2))
    expected = roi_align_oracle(feat, roi, (2, 2), 1.0)
    np.testing.assert_allclose(np.asarray(got)[0, :, :, 0], expected, rtol=1e-5)


def test_roi_align_multichannel_batch():
    rng = np.random.RandomState(0)
    feat = rng.rand(2, 8, 8, 3).astype(np.float32)
    rois = jnp.asarray(
        [[0, 0.5, 0.5, 6.0, 7.0], [1, 2.0, 1.0, 7.5, 6.5]], jnp.float32
    )
    got = np.asarray(roi_align(jnp.asarray(feat), rois, 1.0, (3, 3)))
    for r in range(2):
        b = int(rois[r, 0])
        for c in range(3):
            expected = roi_align_oracle(
                feat[b, :, :, c], np.asarray(rois[r, 1:]), (3, 3), 1.0
            )
            np.testing.assert_allclose(got[r, :, :, c], expected, rtol=1e-4, atol=1e-5)


def test_roi_align_scale_invariance():
    # reference test_roi_pool.py: pooling a 2x-resized feature with 2x scale
    # gives approximately the same result
    rng = np.random.RandomState(1)
    feat = rng.rand(1, 6, 6, 1).astype(np.float32)
    feat2 = np.kron(feat[0, :, :, 0], np.ones((2, 2))).astype(np.float32)[None, :, :, None]
    rois = jnp.asarray([[0, 4.0, 4.0, 10.0, 10.0]], jnp.float32)
    a = roi_align(jnp.asarray(feat), rois, spatial_scale=0.5, output_size=(2, 2))
    b = roi_align(jnp.asarray(feat2), rois, spatial_scale=1.0, output_size=(2, 2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.15)


def test_multilevel_assignment():
    # small roi -> fine level, large roi -> coarse level
    # feature sizes consistent with a 512px image so the big RoI stays in range
    N, C = 1, 2
    f1 = jnp.ones((N, 128, 128, C)) * 1.0   # stride 4
    f2 = jnp.ones((N, 64, 64, C)) * 2.0     # stride 8
    f3 = jnp.ones((N, 32, 32, C)) * 3.0     # stride 16
    f4 = jnp.ones((N, 16, 16, C)) * 4.0     # stride 32
    rois = jnp.asarray(
        [
            [0, 10, 10, 60, 60],      # sqrt(area)=50 → lvl2 (clipped to min)
            [0, 0, 0, 500, 500],      # sqrt(area)=500 → lvl 5 → stride 32
        ],
        jnp.float32,
    )
    out = multilevel_roi_align([f1, f2, f3, f4], rois, [4, 8, 16, 32], (2, 2))
    got = np.asarray(out)
    assert np.allclose(got[0], 1.0)
    assert np.allclose(got[1], 4.0)

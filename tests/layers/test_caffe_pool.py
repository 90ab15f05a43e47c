"""caffe_pooling_2d vs a literal numpy transcription of Caffe's pooling
(ceil-mode output size, clamped last window, AVE counts padded zeros)."""
import jax.numpy as jnp
import numpy as np
import pytest

from basedet_tpu.layers import caffe_pooling_2d


def naive_caffe_pool(x, k, s, p, mode):
    B, H, W, C = x.shape
    ch = (H + 2 * p - k + s - 1) // s + 1
    cw = (W + 2 * p - k + s - 1) // s + 1
    if p > 0:
        if (ch - 1) * s >= H + p:
            ch -= 1
        if (cw - 1) * s >= W + p:
            cw -= 1
    out = np.zeros((B, ch, cw, C), np.float32)
    for y in range(ch):
        for xx in range(cw):
            y0, x0 = y * s - p, xx * s - p
            ys = slice(max(0, y0), min(H, y0 + k))
            xs = slice(max(0, x0), min(W, x0 + k))
            win = x[:, ys, xs, :]
            if mode == "max":
                out[:, y, xx] = win.max(axis=(1, 2))
            else:
                out[:, y, xx] = win.sum(axis=(1, 2)) / (k * k)
    return out


@pytest.mark.parametrize("hwksp", [(7, 7, 3, 2, 0), (8, 9, 3, 2, 1),
                                   (5, 5, 2, 2, 1), (10, 11, 3, 3, 1)])
@pytest.mark.parametrize("mode", ["max", "average"])
def test_matches_caffe_oracle(hwksp, mode):
    H, W, k, s, p = hwksp
    x = np.random.RandomState(0).randn(2, H, W, 4).astype(np.float32)
    got = np.asarray(caffe_pooling_2d(jnp.asarray(x), k, s, p, mode))
    ref = naive_caffe_pool(x, k, s, p, mode)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_ceil_mode_differs_from_floor():
    # 8x8, k3 s2 p0: floor gives (8-3)//2+1 = 3, Caffe ceil gives 4
    x = jnp.ones((1, 8, 8, 1))
    assert caffe_pooling_2d(x, 3, 2, 0, "max").shape[1:3] == (4, 4)

"""Caffe-compatible pooling (ceil-mode output size).

Capability analogue of /root/reference/basedet/layers/blocks/pool.py:17-61
(CaffePooling2d): Caffe computes the output size with ceil division and
clamps the last window so it starts inside the padded input; MegEngine/JAX
use floor. Needed for loading zoo weights of Caffe-era backbones where one
row/col of difference breaks the FPN shape contract. NHWC, pure function.
"""
from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
from jax import lax


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


def caffe_pooling_2d(
    x: jnp.ndarray,
    kernel_size: Union[int, Tuple[int, int]],
    stride: Union[int, Tuple[int, int], None] = None,
    padding: Union[int, Tuple[int, int]] = 0,
    mode: str = "max",
) -> jnp.ndarray:
    """Pool NHWC ``x`` with Caffe's ceil-mode output-size rule.

    ``mode`` is "max" or "average"; average counts padded zeros in the
    divisor (Caffe AVE / MegEngine "average" semantics, pool.py:47-50).
    """
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride) if stride is not None else (kh, kw)
    ph, pw = _pair(padding)
    assert mode in ("max", "average"), mode

    h, w = x.shape[1], x.shape[2]
    # Caffe: ceil((H + 2p - k) / s) + 1, clamped so the last window starts
    # inside input+padding (pool.py:38-44)
    caffe_h = (h + 2 * ph - kh + sh - 1) // sh + 1
    caffe_w = (w + 2 * pw - kw + sw - 1) // sw + 1
    if ph > 0 or pw > 0:
        if (caffe_h - 1) * sh >= h + ph:
            caffe_h -= 1
        if (caffe_w - 1) * sw >= w + pw:
            caffe_w -= 1

    # pad exactly what the ceil-mode windows read: ph/pw in front, whatever
    # the last window still needs at the back
    back_h = max(0, (caffe_h - 1) * sh + kh - h - ph)
    back_w = max(0, (caffe_w - 1) * sw + kw - w - pw)
    dims = (1, kh, kw, 1)
    strides = (1, sh, sw, 1)
    pads = ((0, 0), (ph, back_h), (pw, back_w), (0, 0))

    if mode == "max":
        init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
        out = lax.reduce_window(x, init, lax.max, dims, strides, pads)
    else:
        out = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads) / (kh * kw)
    assert out.shape[1] == caffe_h and out.shape[2] == caffe_w, (
        out.shape, caffe_h, caffe_w
    )
    return out

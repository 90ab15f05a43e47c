"""Stride-2 conv with a sub-pixel (parity-decomposed) input gradient.

XLA computes the dgrad of a stride-2 conv as an input-dilated convolution
(lhs_dilation=2): 3/4 of the multiplies hit inserted zeros and the lowering
measured ~1.5-6 TF/s on v5e at backbone shapes (playground/conv_eff.py,
dark4 3x3/2 fwd+bwd 4.2x the fwd). The same operator factors exactly into
four dense stride-1 convs — one per output-pixel parity (a, b) — using the
parity sub-kernels of the io-transposed kernel:

    dx[2i+a, 2j+b] = Σ_t dy[i + m_min_a + t] · w[u_max_a − 2t]   (per axis)

(same trick as ops/subpixel.py, which fixes the forward ConvTranspose).
The weight gradient is delegated to XLA's standard wgrad (jax.vjp of the
plain conv w.r.t. w only).

Used by the stride-2 convs in the backbones (CSPDarknet downsample convs,
the fused Focus stem, ResNet stem/downsamples) — every model's trunk
backward rides this.
"""
from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _plain_conv_s2(x, w, pad: Tuple[int, int]):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), [pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _parity_taps(k: int, p: int, a: int):
    """Tap list for output parity ``a``: kernel indices u ≡ (a+p) mod 2 in
    DESCENDING order (conv tap t ↔ u = u_max − 2t), plus the dy index range
    [m_min, m_max] they touch (m = (a + p − u) / 2)."""
    us = [u for u in range(k) if (a + p - u) % 2 == 0]
    if not us:
        return [], 0, -1
    m_min = (a + p - us[-1]) // 2
    m_max = (a + p - us[0]) // 2
    return list(reversed(us)), m_min, m_max


def _dgrad_subpixel(dy, w, pad: Tuple[int, int], x_shape):
    """dx for y = conv_s2(x, w) via four dense stride-1 convs.

    dy (B, Ho, Wo, Co); w (k, k, Ci, Co); dx (B, H, W, Ci)."""
    B, H, W, Ci = x_shape
    k = w.shape[0]
    p = pad[0]
    wt = jnp.swapaxes(w, 2, 3)  # (k, k, Co, Ci): contract Co

    parts = {}
    for a in range(2):
        us_a, my_lo, my_hi = _parity_taps(k, p, a)
        ha = (H - a + 1) // 2  # rows of this parity
        for b in range(2):
            us_b, mx_lo, mx_hi = _parity_taps(k, p, b)
            wb = (W - b + 1) // 2
            if not us_a or not us_b:
                parts[(a, b)] = jnp.zeros((B, ha, wb, Ci), dy.dtype)
                continue
            sub = wt[jnp.asarray(us_a)][:, jnp.asarray(us_b)]  # (Ta, Tb, Co, Ci)
            # out[i] = Σ_t dy[i + m_lo + t] · sub[t]: conv pad_lo = −m_lo,
            # pad_hi covers i up to ha−1: need dy index ha−1+m_hi ≤ Ho−1+ph
            Ho, Wo = dy.shape[1], dy.shape[2]
            py = (-my_lo, (ha - 1 + my_hi) - (Ho - 1))
            px = (-mx_lo, (wb - 1 + mx_hi) - (Wo - 1))
            parts[(a, b)] = jax.lax.conv_general_dilated(
                dy, sub, (1, 1), [py, px],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # (B, ha, wb, Ci)

    # interleave parities; pad odd tails so stacking is rectangular
    h2, w2 = (H + 1) // 2, (W + 1) // 2

    def pad_to(t, ph, pw):
        return jnp.pad(t, ((0, 0), (0, ph - t.shape[1]),
                           (0, pw - t.shape[2]), (0, 0)))

    r0 = jnp.stack([pad_to(parts[(0, 0)], h2, w2),
                    pad_to(parts[(0, 1)], h2, w2)], axis=3)
    r1 = jnp.stack([pad_to(parts[(1, 0)], h2, w2),
                    pad_to(parts[(1, 1)], h2, w2)], axis=3)
    rows = jnp.stack([r0, r1], axis=2)  # (B, h2, 2, w2, 2, Ci)
    out = rows.reshape(B, 2 * h2, 2 * w2, Ci)
    return out[:, :H, :W, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv2d_s2(x, w, pad: Tuple[int, int]):
    """Stride-2 NHWC/HWIO conv; backward dx via the sub-pixel decomposition
    (dense stride-1 convs) instead of XLA's input-dilated dgrad."""
    return _plain_conv_s2(x, w, pad)


def _fwd(x, w, pad):
    return _plain_conv_s2(x, w, pad), (x, w)


def _wgrad_subpixel(x, dy, k: int, pad: Tuple[int, int]):
    """dw[u, v, ci, co] = Σ_{b,i,j} x[b, 2i+u−p, 2j+v−p, ci] · dy[b,i,j,co]
    as k² dense einsums over stride-2 slices of the padded input (XLA's own
    wgrad dilates dy by 2 instead). Same FLOPs, all MXU-shaped."""
    p = pad[0]
    B, Ho, Wo, Co = dy.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    rows = []
    for u in range(k):
        cols = []
        for v in range(k):
            xs = jax.lax.slice(
                xp, (0, u, v, 0),
                (B, u + 2 * Ho - 1, v + 2 * Wo - 1, x.shape[3]),
                (1, 2, 2, 1),
            )  # (B, Ho, Wo, Ci)
            cols.append(jnp.einsum(
                "bijc,bijo->co", xs, dy,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype))
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # (k, k, Ci, Co)


def _bwd(pad, res, dy):
    import os

    x, w = res
    dx = _dgrad_subpixel(dy, w, pad, x.shape)
    if os.environ.get("BASEDET_S2_WGRAD") == "subpix":
        dw = _wgrad_subpixel(x, dy, w.shape[0], pad)
    else:
        _, w_vjp = jax.vjp(lambda ww: _plain_conv_s2(x, ww, pad), w)
        (dw,) = w_vjp(dy)
    return dx, dw


conv2d_s2.defvjp(_fwd, _bwd)


def use_subpixel_dgrad() -> bool:
    """TPU-only dispatch (the XLA CPU dgrad is fine); BASEDET_S2_DGRAD=xla
    forces the plain path for A/B benchmarking."""
    import os

    v = os.environ.get("BASEDET_S2_DGRAD")
    if v == "xla":
        return False
    if v == "subpix":
        return True
    # default OFF until the TPU A/B (playground/conv_eff.py dgrad) lands —
    # the dgrad pathology is probed but the subpix path is not yet measured
    # in-train, and this dispatch sits under the headline YOLOX benchmark.
    return False


class S2Conv(nn.Module):
    """Drop-in for nn.Conv(features, (k, k), strides=(2, 2), padding=p):
    identical params ("kernel" HWIO, optional "bias") and forward numerics;
    backward dx via conv2d_s2's sub-pixel decomposition."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    padding: Any = 0
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        assert kh == kw, "S2Conv is specialized to square kernels"
        p = self.padding
        assert isinstance(p, int), (
            "S2Conv takes a symmetric int padding (the precision.Conv "
            f"dispatch guards this); got {p!r}"
        )
        pad = (p, p)
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features)
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias else None
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype) if bias is not None else None
        y = conv2d_s2(x, kernel, pad)
        if bias is not None:
            y = y + bias
        return y

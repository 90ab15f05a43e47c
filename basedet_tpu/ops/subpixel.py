"""Sub-pixel (pixel-shuffle) formulation of stride-2 transposed conv.

Two problems with flax ``nn.ConvTranspose((4,4), (2,2), padding=((1,1),(1,1)))``
for the CenterNet head (reference DeconvLayer,
/root/reference/basedet/layers/head/center_head.py:30-66):

1. **Parity**: lax/flax conv_transpose pads the *dilated* input, giving
   2H−2 output (20→38→74→146 for the 640px pipeline) — torch/MegEngine
   ``ConvTranspose2d(k=4, s=2, p=1)`` gives exactly 2H (20→40→80→160).
   The round-1 head silently ran at the wrong output stride.
2. **Speed**: XLA lowers conv_transpose as an input-dilated conv (3/4 of
   multiplies hit zeros) at ~2.7 TF/s measured on v5e
   (playground/ablate_dcn.py — 16.7 ms of CenterNet's 96 ms step).

The torch operator factors exactly into ONE dense stride-1 2x2 conv with
the four parity sub-kernels of the spatially-flipped kernel stacked on the
output-channel axis, plus a shifted-slice interleave:

    y[2i+a, 2j+b] = Σ_{s,t∈{0,1}} x[i−1+s+a', j−1+t+b'] · wf[a::2, b::2][s, t]

(wf = w[::-1, ::-1]; a'=a shifts the slice window). Dense stride-1 convs
are the MXU fast path; FLOPs are identical (no zeros multiplied).
Verified bit-close (1e-4) against torch.nn.functional.conv_transpose2d in
tests/ops/test_subpixel.py, gradients included.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv_transpose_s2_subpixel(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, Ci); w (4, 4, Ci, Co) HWIO, **torch semantics**: equals
    torch ``conv_transpose2d(x, w_torch, stride=2, padding=1)`` where
    ``w_torch = w.transpose(2, 3, 0, 1)`` → (B, 2H, 2W, Co)."""
    B, H, W, Ci = x.shape
    assert w.shape[0] == 4 and w.shape[1] == 4, "specialized to 4x4"
    Co = w.shape[3]
    wf = w[::-1, ::-1]  # torch transposed-conv scatters the unflipped kernel
    # parity sub-kernels, stacked on the output-channel axis: (2, 2, Ci, 4Co)
    wcat = jnp.concatenate(
        [wf[0::2, 0::2], wf[0::2, 1::2], wf[1::2, 0::2], wf[1::2, 1::2]],
        axis=-1,
    )
    y = jax.lax.conv_general_dilated(
        x, wcat, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H+1, W+1, 4Co)
    y00 = y[:, :H, :W, :Co]
    y01 = y[:, :H, 1:, Co:2 * Co]
    y10 = y[:, 1:, :W, 2 * Co:3 * Co]
    y11 = y[:, 1:, 1:, 3 * Co:]
    r0 = jnp.stack([y00, y01], axis=3)  # (B, H, W, 2, Co)
    r1 = jnp.stack([y10, y11], axis=3)
    rows = jnp.stack([r0, r1], axis=2)  # (B, H, 2, W, 2, Co)
    return rows.reshape(B, 2 * H, 2 * W, Co)


class SubpixelConvTranspose2x(nn.Module):
    """Torch-parity ConvTranspose2d(k=4, s=2, p=1, bias=False) with the
    sub-pixel compute path. Kernel is stored HWIO (4, 4, Ci, Co) like flax
    ConvTranspose, so checkpoint layouts are unchanged."""

    features: int
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (4, 4, x.shape[-1], self.features)
        )
        # late import: ops.subpixel is imported by layers (head modules), so
        # a top-level layers.precision import would be circular via
        # layers/__init__
        from basedet_tpu.layers.precision import compute_dtype

        dt = compute_dtype()
        if dt is not None:
            x = x.astype(dt)
            kernel = kernel.astype(dt)
        return conv_transpose_s2_subpixel(x, kernel)

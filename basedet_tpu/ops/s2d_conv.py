"""Space-to-depth packed stride-2 convolution.

Stride-2 convs (stage transitions in every backbone: resnet downsamples,
CSP dark3/4/5, the 6x6 stem — reference models/cls/resnet.py:116-258,
csp_darknet.py:10-95) are doubly bad on TPU:

1. **fwd lane underfill**: early-stage convs have few channels (C=64 at
   160² in YOLOX-S), filling half or less of the 128-wide MXU lanes.
2. **bwd dgrad**: XLA lowers the stride-2 input gradient as an
   input-dilated conv (a round-2 parity-decomposed workaround was measured
   on-TPU in round 3 and lost in-train; deleted — see docs/ROADMAP.md).

The space-to-depth formulation fixes both at once: pack the input
(B, H, W, C) → (B, H/2, W/2, 4C) (phase order (di, dj) = 00, 01, 10, 11 on
the channel axis), and the k×k/s2 conv becomes a DENSE STRIDE-1
ceil((k+1)/2)² conv over 4C channels:

    out(i, j) = Σ_{u,v} x[2i+u, 2j+v] w[u, v]          (u, v ∈ -p .. k-1-p)
    x[2i+u] = xp[i + (u+p_a*2)//2, phase (u % 2)]  →  one packed tap per (u)

For k=3, p=1: a 2×2 packed kernel with padding ((1,0),(1,0)) whose tap
(a, di) holds w row u = 2a + di - 2 (tap (0,0) is zero). K-dim grows
576 → 1024 (×16/9 FLOPs) but both matmul dims fill the MXU, and the
backward is plain stride-1 dgrad/wgrad. A/B on-chip: playground/conv_eff.py
pack mode.

Exact-equality tested against lax.conv_general_dilated in
tests/ops/test_s2d_conv.py (f32 bit-exact modulo summation order; bf16).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/2, W/2, 4C); channel blocks ordered by phase
    (di, dj) ∈ 00, 01, 10, 11 then original C."""
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/2, W/2, di, dj, C)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def pack_s2_kernel(w: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Map an HWIO (k, k, C, Co) stride-2 kernel to the packed stride-1
    kernel (ka, ka, 4C, Co) consumed by ``s2d_conv`` on space-to-depth input.

    With packed left-padding q = ceil(p/2), packed tap (a, da) reads
    original kernel row u = 2a + da - shift, shift = 2q - p (taps mapping
    outside 0..k-1 are zero).
    """
    k = w.shape[0]
    C, Co = w.shape[2], w.shape[3]
    q = (padding + 1) // 2
    shift = 2 * q - padding
    ka = -(-(k + shift) // 2)
    # zero-pad rows/cols to 2*ka with the shift offset, then fold the
    # within-pair index into the phase axis: wp[a, b, da, db] = w[2a+da-shift]
    t = 2 * ka - k - shift
    wz = jnp.pad(w, ((shift, t), (shift, t), (0, 0), (0, 0)))
    wz = wz.reshape(ka, 2, ka, 2, C, Co).transpose(0, 2, 1, 3, 4, 5)
    return wz.reshape(ka, ka, 4 * C, Co)


def packed_geometry(k: int, padding: int):
    """(packed_kernel_size, packed_left_padding) for a k×k/s2 conv with
    symmetric input padding p (the right padding is derived from the
    output size in ``s2d_conv``)."""
    q = (padding + 1) // 2
    shift = 2 * q - padding
    ka = -(-(k + shift) // 2)
    return ka, q


@partial(jax.jit, static_argnames=("padding",))
def s2d_conv(x: jnp.ndarray, w: jnp.ndarray, padding: int) -> jnp.ndarray:
    """k×k stride-2 conv with symmetric padding p, computed as a dense
    stride-1 conv on the space-to-depth packing. Equals
    ``lax.conv_general_dilated(x, w, (2,2), [(p,p),(p,p)], NHWC/HWIO)``
    for even H, W."""
    B, H, W, C = x.shape
    k = w.shape[0]
    xp = space_to_depth(x)
    wp = pack_s2_kernel(w, padding)
    ka, pad_lo = packed_geometry(k, padding)
    Ho = (H + 2 * padding - k) // 2 + 1
    # output size with stride-1 packed conv: H/2 + pad_lo + pad_hi - ka + 1
    pad_hi = Ho - (H // 2) - pad_lo + ka - 1
    return jax.lax.conv_general_dilated(
        xp, wp, (1, 1), [(pad_lo, pad_hi), (pad_lo, pad_hi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def use_s2d_pack() -> bool:
    """Opt-in flag for routing stride-2 convs through the packed
    formulation (pending on-TPU A/B; see module docstring)."""
    return os.environ.get("BASEDET_S2_PACK", "0").lower() in ("1", "true", "pack")

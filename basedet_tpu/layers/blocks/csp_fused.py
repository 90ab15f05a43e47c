"""Fused-BN CSP layer forward (train mode) built on ops/fused_bn.py.

Semantics match ``yolo_block.CSPLayer`` (C3: conv1/conv2 1x1 splits, n
bottlenecks (1x1 + 3x3, optional residual), concat, conv3 1x1 — reference
/root/reference/basedet/layers/blocks/yolo_block.py:91-133) with train-mode
BatchNorm, but the HBM traffic is restructured per the round-3 diagnosis:

  * every 1x1 conv is a Pallas GEMM carrying its BN stats in the epilogue
    and its input normalize+SiLU in the prologue (ops/fused_bn.py);
  * raw (pre-BN) tensors are the only activations materialized; shortcut
    sums and the concat fold into consumer prologues as sums of
    normalized raw terms / split-K GEMM terms;
  * the 3x3 bottleneck conv stays an XLA conv in this cut: its input
    activation is materialized by one fused elementwise pass and its
    output stats are one fused reduce (both single-pass).

Numerics: identical operation order to the unfused path up to (a) BN batch
variance computed as E[y^2]-E[y]^2 from the fused sums instead of
E[(y-mu)^2] (tiny fp drift) and (b) bf16 rounding of the normalized
activations at kernel boundaries — equivalence tested in
tests/layers/test_csp_fused.py.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.ops.fused_bn import (
    fused_gemm_stats,
    moments_to_affine,
    stats_to_moments,
)


def _silu_bf16(pre_f32):
    return (pre_f32 * jax.nn.sigmoid(pre_f32)).astype(jnp.bfloat16)


def _pack_factor(widths, rows) -> int:
    """Lane-packing factor g: Pallas/Mosaic lays custom-call operands out
    T(8,128)-tiled, so an (M, w) tensor with w<128 physically occupies
    M x roundup(w,128) HBM bytes (4x for w=32 — the round-4 OOM dump,
    logs/probe_fused_bn_r4.log). Packing g consecutive rows into lanes —
    (M, w) -> (M/g, g*w), a free row-major bitcast — makes every operand's
    lane count a multiple of 128, restoring physical == logical bytes.
    """
    g = 1
    for w in widths:
        need = 128 // np.gcd(128, int(w))  # lcm(128,w)/w
        g = int(np.lcm(g, need))
    if rows % g:
        return 1  # fallback: unpacked (correct, just padded)
    return g


def csp_layer_fused(
    params: Dict[str, jnp.ndarray],
    x4d: jnp.ndarray,
    n: int,
    *,
    shortcut: bool = True,
    eps: float = 1e-3,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Train-mode fused CSP forward.

    params keys: ``{conv1,conv2,m{i}a,m{i}b,conv3}/{w,g,b}`` where w is
    (k,k,ci,co) (1x1 convs may also pass (ci,co)), g/b the BN scale/bias.
    Returns (out4d activation, {key: (batch_mean, batch_var)}) — moments
    are what the caller needs for running-stat (momentum) updates.
    """
    B, H, W, C = x4d.shape
    h = params["conv1/w"].shape[-1]
    out_ch = params["conv3/w"].shape[-1]
    M = B * H * W
    moments: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}

    # Lane packing (see _pack_factor): all M-tensors crossing a pallas_call
    # are held as (M/g, g*w); weights become kron(eye(g), w) block-diagonals
    # (g x FLOPs on GEMMs — irrelevant, the chain is HBM-BW-bound); per-
    # channel vectors are tiled g times; kernel stats come back per packed
    # lane and fold (g, w) -> (w,). All glue is differentiable jnp outside
    # the custom VJP, so backward unpacks automatically.
    g = _pack_factor({C, h, out_ch}, M)
    Mp = M // g
    eye_g = jnp.eye(g, dtype=jnp.bfloat16)

    def pack(t):  # (..., w) M-major -> (M/g, g*w); free bitcast
        return t.reshape(Mp, -1)

    def wpack(w):  # (K, N) -> block-diag (g*K, g*N); bf16 like nn.Conv
        w = w.astype(jnp.bfloat16)
        return jnp.kron(eye_g, w) if g > 1 else w

    def vtile(v):  # (N,) -> (g*N,)
        return jnp.tile(v, g) if g > 1 else v

    x = pack(x4d)

    def w2d(key):
        w = params[key + "/w"]
        return w.reshape(w.shape[-2:]) if w.ndim == 4 else w

    def affine(key, s, ss):
        mean, var = stats_to_moments(s, ss, M)
        moments[key] = (mean, var)
        return moments_to_affine(
            mean, var, params[key + "/g"], params[key + "/b"], eps
        )

    def fold(s):  # packed (g*N,) stat -> logical (N,)
        return s.reshape(g, -1).sum(0) if g > 1 else s

    def g1x1(key, terms):
        """terms: ("act", x_packed) | ("raw", [(y_packed, sc, sh), ...])
        with LOGICAL sc/sh; returns packed y and logical sc/sh."""
        wp = wpack(w2d(key))
        full = []
        for t in terms:
            if t[0] == "act":
                full.append(("act", t[1], wp))
            else:
                full.append((
                    "raw",
                    [(y, vtile(sc), vtile(sh)) for y, sc, sh in t[1]],
                    wp,
                ))
        y, s, ss = fused_gemm_stats(full, interpret=interpret)
        sc, sh = affine(key, fold(s), fold(ss))
        return y, sc, sh

    y1, sc1, sh1 = g1x1("conv1", [("act", x)])
    y2, sc2, sh2 = g1x1("conv2", [("act", x)])

    left = [(y1, sc1, sh1)]
    for i in range(n):
        ya, sca, sha = g1x1(f"m{i}a", [("raw", list(left))])
        # 3x3 conv in XLA on the materialized activation (one fused
        # elementwise pass produces it; one fused reduce takes its stats)
        a = _silu_bf16(
            ya.astype(jnp.float32) * vtile(sca) + vtile(sha)
        )
        # bf16 in / bf16 out (MXU accumulates f32 internally) — matching
        # flax nn.Conv(dtype=bf16); a preferred_element_type=f32 variant
        # breaks under grad (mixed-dtype transpose conv).
        yb4 = jax.lax.conv_general_dilated(
            a.reshape(B, H, W, h), params[f"m{i}b/w"].astype(jnp.bfloat16),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        ybf = yb4.reshape(M, h).astype(jnp.float32)
        scb, shb = affine(
            f"m{i}b", jnp.sum(ybf, axis=0), jnp.sum(ybf * ybf, axis=0)
        )
        yb = pack(yb4)
        if shortcut:
            left.append((yb, scb, shb))
        else:
            left = [(yb, scb, shb)]

    w3 = w2d("conv3")
    # conv3 is a split-K GEMM: left-branch terms hit w3[:h], right y2 hits
    # w3[h:] — two separately-packed weights, one fused output + stats.
    wl, wr = wpack(w3[:h]), wpack(w3[h:])
    y3, s3, ss3 = fused_gemm_stats(
        [
            ("raw", [(y, vtile(sc), vtile(sh)) for y, sc, sh in left], wl),
            ("raw", [(y2, vtile(sc2), vtile(sh2))], wr),
        ],
        interpret=interpret,
    )
    sc3, sh3 = affine("conv3", fold(s3), fold(ss3))
    out = _silu_bf16(y3.astype(jnp.float32) * vtile(sc3) + vtile(sh3))
    # out_channels may differ from the input C (PAFPN reduce layers)
    return out.reshape(B, H, W, out_ch), moments


def flax_csp_params_to_fused(variables, n: int) -> Dict[str, jnp.ndarray]:
    """Map a yolo_block.CSPLayer variables dict to csp_layer_fused params."""
    p = variables["params"]
    out = {}

    def grab(dst, src):
        out[dst + "/w"] = src["conv"]["kernel"]
        out[dst + "/g"] = src["BatchNorm_0"]["scale"]
        out[dst + "/b"] = src["BatchNorm_0"]["bias"]

    grab("conv1", p["conv1"])
    grab("conv2", p["conv2"])
    for i in range(n):
        grab(f"m{i}a", p[f"m_{i}"]["conv1"])
        grab(f"m{i}b", p[f"m_{i}"]["conv2"])
    grab("conv3", p["conv3"])
    return out

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

from basedet_tpu.ops.fused_bn import (
    fused_gemm_stats,
    moments_to_affine,
    stats_to_moments,
)


def _silu_bf16(pre_f32):
    return (pre_f32 * jax.nn.sigmoid(pre_f32)).astype(jnp.bfloat16)


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
    M = B * H * W
    x = x4d.reshape(M, C)
    moments: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}

    def w2d(key):
        w = params[key + "/w"]
        return w.reshape(w.shape[-2:]) if w.ndim == 4 else w

    def affine(key, s, ss):
        mean, var = stats_to_moments(s, ss, M)
        moments[key] = (mean, var)
        return moments_to_affine(
            mean, var, params[key + "/g"], params[key + "/b"], eps
        )

    def g1x1(key, terms):
        w = w2d(key)
        y, s, ss = fused_gemm_stats(
            [t + (w,) for t in terms], interpret=interpret
        )
        sc, sh = affine(key, s, ss)
        return y, sc, sh

    y1, sc1, sh1 = g1x1("conv1", [("act", x)])
    y2, sc2, sh2 = g1x1("conv2", [("act", x)])

    left = [(y1, sc1, sh1)]
    for i in range(n):
        ya, sca, sha = g1x1(f"m{i}a", [("raw", list(left))])
        # 3x3 conv in XLA on the materialized activation (one fused
        # elementwise pass produces it; one fused reduce takes its stats)
        a = _silu_bf16(ya.astype(jnp.float32) * sca + sha)
        # bf16 in / bf16 out (MXU accumulates f32 internally) — matching
        # flax nn.Conv(dtype=bf16); a preferred_element_type=f32 variant
        # breaks under grad (mixed-dtype transpose conv).
        yb4 = jax.lax.conv_general_dilated(
            a.reshape(B, H, W, h), params[f"m{i}b/w"].astype(jnp.bfloat16),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        yb = yb4.reshape(M, h)
        ybf = yb.astype(jnp.float32)
        scb, shb = affine(
            f"m{i}b", jnp.sum(ybf, axis=0), jnp.sum(ybf * ybf, axis=0)
        )
        if shortcut:
            left.append((yb, scb, shb))
        else:
            left = [(yb, scb, shb)]

    w3 = w2d("conv3")
    y3, s3, ss3 = fused_gemm_stats(
        [("raw", list(left), w3[:h]), ("raw", [(y2, sc2, sh2)], w3[h:])],
        interpret=interpret,
    )
    sc3, sh3 = affine("conv3", s3, ss3)
    out = _silu_bf16(y3.astype(jnp.float32) * sc3 + sh3)
    # out_channels may differ from the input C (PAFPN reduce layers)
    return out.reshape(B, H, W, w3.shape[-1]), moments


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

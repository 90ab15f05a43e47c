"""Pallas TPU kernel for SimOTA/OTA dynamic-k matching.

The XLA scan formulation (layers/common/matcher.py topk_dynamic_k_matching)
re-reads the (K, M) cost/iou matrices from HBM on every one of its 2·k
extraction passes — ~23 ms of the YOLOX-S b128 step. Per image the matrices
are only ~2 MB, so this kernel pins them in VMEM and runs the whole
extraction loop on-chip: one HBM read of cost+ious total.

Algorithm (identical selection to the scan version, including the
lowest-index tie-break of iterative argmax/argmin):
  1. dynamic_k[g] = clip(int(Σ top-k ious of row g), 1, k) for valid gts
  2. per gt, mark its dynamic_k lowest-cost anchors (k masked-argmin passes)
  3. anchors marked by >1 gt resolve to the argmin-cost gt

Capability analogue of the reference's dynamic_k_matching python loop
(/root/reference/basedet/models/det/yolox.py:375-408) — third formulation
after the per-GT loop (reference) and the XLA scan (matcher.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_I = 2**30  # python literal: a jnp scalar here would be a captured const


def _matching_kernel(k_cap, cost_ref, iou_ref, valid_ref, best_ref, fg_ref):
    """Grid: (B,). Blocks: cost/iou (1, K, M) f32, valid (1, K, 1) f32;
    outputs best_gt (1, M) int32, fg (1, M) int32. K, M tile-padded by the
    caller (pad rows: valid=0; pad cols: cost=+3e38, iou=0)."""
    cost = cost_ref[0]          # (K, M)
    ious = iou_ref[0]           # (K, M)
    valid = valid_ref[0]        # (K, 1)
    K, M = cost.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (K, M), 1)
    INF = jnp.float32(3e38)

    # -- 1. dynamic_k from the sum of each row's top-k ious ------------------
    iou_work = ious
    s = jnp.zeros((K, 1), jnp.float32)
    for _ in range(k_cap):
        m = jnp.max(iou_work, axis=1, keepdims=True)              # (K, 1)
        am = jnp.min(
            jnp.where(iou_work == m, col, _BIG_I), axis=1, keepdims=True
        )
        s = s + m
        iou_work = jnp.where(col == am, -INF, iou_work)
    dk = jnp.clip(s.astype(jnp.int32), 1, k_cap)
    dk = jnp.where(valid > 0.5, dk, 0)                            # (K, 1)

    # -- 2. per-gt dynamic_k lowest-cost anchors ------------------------------
    work = cost
    matching = jnp.zeros((K, M), jnp.float32)
    for i in range(k_cap):
        mn = jnp.min(work, axis=1, keepdims=True)
        am = jnp.min(
            jnp.where(work == mn, col, _BIG_I), axis=1, keepdims=True
        )
        pick = col == am
        take = pick & (i < dk)
        matching = jnp.where(take, 1.0, matching)
        work = jnp.where(pick, INF, work)

    # -- 3. conflict resolution: argmin-cost gt per anchor --------------------
    num = jnp.sum(matching, axis=0, keepdims=True)                # (1, M)
    cm = jnp.where(matching > 0.5, cost, INF)
    mn0 = jnp.min(cm, axis=0, keepdims=True)                      # (1, M)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, M), 0)
    best = jnp.min(jnp.where(cm == mn0, row, _BIG_I), axis=0, keepdims=True)
    best_ref[0, :, :] = jnp.minimum(best, K - 1)  # rows w/o match → clamp
    fg_ref[0, :, :] = (num > 0.5).astype(jnp.int32)


def _pad_to(x, mult, axis, value):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("k_cap", "interpret"))
def dynamic_k_matching_pallas(
    cost: jnp.ndarray,       # (B, K, M) f32 — +large for invalid entries
    ious: jnp.ndarray,       # (B, K, M) f32 — 0 for invalid entries
    gt_valid: jnp.ndarray,   # (B, K) bool
    k_cap: int = 10,
    interpret: bool = False,
):
    """Batched dynamic-k matching. Returns (best_gt (B, M) int32,
    fg_mask (B, M) bool).

    Safe inside differentiated graphs: the assignment is piecewise constant
    in (cost, ious), so the custom VJP is zero — pallas_call itself has no
    autodiff rule (same pattern as ops/nms_pallas.py)."""
    if interpret:
        return _matching_impl(cost, ious, gt_valid.astype(jnp.float32), k_cap, True)
    return _matching_core(
        cost.astype(jnp.float32),
        ious.astype(jnp.float32),
        gt_valid.astype(jnp.float32),
        k_cap,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _matching_core(cost, ious, valid_f, k_cap):
    return _matching_impl(cost, ious, valid_f, k_cap, False)


def _matching_core_fwd(cost, ious, valid_f, k_cap):
    return _matching_core(cost, ious, valid_f, k_cap), (cost, ious, valid_f)


def _matching_core_bwd(k_cap, residuals, _cotangents):
    c, i, v = residuals
    return jnp.zeros_like(c), jnp.zeros_like(i), jnp.zeros_like(v)


_matching_core.defvjp(_matching_core_fwd, _matching_core_bwd)


@functools.partial(jax.jit, static_argnames=("k_cap", "interpret"))
def _matching_impl(cost, ious, valid_f, k_cap, interpret):
    B, K, M = cost.shape
    cost_p = _pad_to(_pad_to(cost, 8, 1, 3e38), 128, 2, 3e38)
    iou_p = _pad_to(_pad_to(ious, 8, 1, 0.0), 128, 2, 0.0)
    valid_p = _pad_to(valid_f, 8, 1, 0.0)[..., None]
    Kp, Mp = cost_p.shape[1:]

    best, fg = pl.pallas_call(
        functools.partial(_matching_kernel, min(k_cap, M)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Kp, Mp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp, Mp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # (B, 1, Mp) with block (1, 1, Mp): the trailing two block dims
            # equal the array dims, satisfying the TPU (8, 128) tiling rule
            pl.BlockSpec((1, 1, Mp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Mp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.int32),
        ],
        interpret=interpret,
    )(cost_p, iou_p, valid_p)
    return best[:, 0, :M], fg[:, 0, :M] > 0

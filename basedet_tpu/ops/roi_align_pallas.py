"""Pallas TPU kernel for separable-matmul RoIAlign.

Same math as ops/roi_align_separable.py (pooled = Py @ F @ Pxᵀ per RoI, one
call per FPN level, level mask folded into the weights) but fused so the
(G·ph, W·C) stage-1 intermediate never leaves VMEM — the XLA einsum pair
round-trips it through HBM (≈0.6 GB/image-level at Faster R-CNN shapes).

Structure per level:
  grid = (B, C/CT, R/G)  — roi-group minor, so the (H, W, CT) feature block
  stays VMEM-resident across all roi groups of one (image, c-tile);
  stage 1:  A = [Py_g] (G·ph, H) @ F (H, W·CT)           (one MXU matmul)
  stage 2:  out[r] = Px_r (pw, W) ⊗ A_r (ph, W, CT)      (small dots)
Backward (dF only — RoIs are stop_gradient'ed at every call site):
  U[r] = Px_rᵀ ⊗ g_r;  dF += [Py_g]ᵀ (H, G·ph) @ U (G·ph, W·CT),
  accumulated in VMEM across roi groups, written once.

RoIs are sorted by assigned level on the host side (static-shape argsort)
so most roi groups are level-pure; a scalar-prefetched per-group activity
mask then skips the matmuls of foreign groups entirely (≈4× less compute
than computing every RoI against every level).

Replaces the round-1 block-gather formulation's 38 ms/step in Faster R-CNN
training (VERDICT round 1, playground/ablate_frcnn_ops.py): no gathers, no
backward scatter-add — only dense MXU work.
"""
from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from basedet_tpu.ops.roi_align_separable import (
    _axis_weights,
    roi_level_assignment,
)

_G = 8  # rois per group. G=16 (stage-1 M = 112 ≈ a full MXU tile) was
# tried with in-kernel W-chunking + fori_loop to fit scoped VMEM and
# measured 60% SLOWER — the serial loop defeats DMA/MXU pipelining
# (playground/ablate_roialign3.py); G=8 full-W is the sweet spot.
# XLA's scoped-vmem limit for custom calls is 16 MB and the axon tunnel
# rejects client-set TPU server flags, so both kernels split the feature H
# axis across pallas calls until their working set fits (measured: the
# unsplit fwd at P2/b8/C=256 needs 20.1 MB and is rejected at compile time).
_ACC_BUDGET = int(3.5 * 2**20)  # bwd f32 accumulator VMEM budget (bytes)
_FWD_BUDGET = 12 * 2**20  # fwd working-set budget (bytes)


def _fwd_kernel(mask_ref, py_ref, px_ref, f_ref, out_ref):
    """py (1, G·ph, H) (roi-major row blocks); px (1, G, pw, W);
    f (1, H, W, CT); out (1, G, ph, pw, CT); mask (B, NRG) scalar-prefetched.

    Mosaic lowers >2D dot_generals by reshaping operands, and vector
    reshapes that merge leading dims into the (sublane) second-minor dim —
    e.g. (G, ph, H) → (G·ph, H) — don't lower (verified on v5e: probe in
    round-2 notes). So py arrives pre-flattened from the host and every dot
    here is a 2D-lhs form that Mosaic compiles."""
    b = pl.program_id(0)
    g = pl.program_id(2)
    ph = out_ref.shape[2]
    G = py_ref.shape[1] // ph

    @pl.when(mask_ref[b, g] == 0)
    def _skip():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(mask_ref[b, g] != 0)
    def _compute():
        # stage 1: A[(g·i), x, c] = Σ_y py[(g·i), y] · f[y, x, c]
        a = jax.lax.dot_general(
            py_ref[0],  # (G·ph, H)
            f_ref[0],  # (H, W, CT)
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G·ph, W, CT)
        # stage 2, one batched dot over the group: contract W.
        # (G·ph, W, CT) → (G, ph, W, CT) splits a leading (non-tiled) dim —
        # Mosaic only rejects reshapes that merge into the sublane/lane dims.
        a4 = a.reshape(G, ph, a.shape[1], a.shape[2])
        o = jax.lax.dot_general(
            px_ref[0],  # (G, W, pw)
            a4,  # (G, ph, W, CT)
            (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, pw, ph, CT)
        out_ref[0] = jnp.transpose(o, (0, 2, 1, 3)).astype(out_ref.dtype)


def _bwd_kernel(mask_ref, py_ref, px_ref, g_ref, df_ref, acc_ref):
    """py (1, G·ph, H) (roi-major row blocks, like fwd); px (1, G, pw, W);
    g (1, G, ph, pw, CT) upstream grads; df (1, H, W, CT) out;
    acc (H, W·CT) f32 scratch accumulated across the roi-group grid axis."""
    b = pl.program_id(0)
    g = pl.program_id(2)
    n_g = pl.num_programs(2)
    ph = g_ref.shape[2]
    G = py_ref.shape[1] // ph

    @pl.when(g == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(mask_ref[b, g] != 0)
    def _compute():
        # u[g, x, i, c] = Σ_j px[g, x, j] · grad[g, i, j, c]
        u = jax.lax.dot_general(
            px_ref[0],  # (G, W, pw)
            g_ref[0],  # (G, ph, pw, CT)
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, W, ph, CT)
        # dF[y, x, c] += Σ_{(g·i)} py[(g·i), y] · u2[(g·i), x, c] as ONE dot:
        # transpose u to (G, ph, W, CT) and merge the two leading (non-tiled)
        # dims — legal in Mosaic; only sublane/lane-dim merges are not.
        # (The fused (0,1)×(0,2) double-contract form fails the tpu.matmul
        # verifier, and per-roi dots cost G× the M-dim tile-ops.)
        u2 = jnp.transpose(u, (0, 2, 1, 3))
        u2 = u2.reshape(G * ph, u2.shape[2], u2.shape[3])
        acc_ref[:] += jax.lax.dot_general(
            py_ref[0],  # (G·ph, H)
            u2,  # (G·ph, W, CT)
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, W, CT)

    @pl.when(g == n_g - 1)
    def _flush():
        df_ref[0] = acc_ref[:].astype(df_ref.dtype)


def _ct_for(C: int, dtype) -> int:
    # Mosaic requires the last block dim to be a multiple of 128 or the full
    # array dim; 128 also caps the VMEM working set.
    return 128 if C % 128 == 0 else C


def _level_call_fwd(f, py, px, mask, interpret: bool):
    """One level's fwd; splits H across pallas calls to fit scoped VMEM.

    Stage 2 is linear in the stage-1 sum over y, so
    out = Σ_chunks kernel(f[:, h0:h1], py[..., h0:h1], px)."""
    B, H, W, C = f.shape
    ph = py.shape[2]
    pw = px.shape[2]
    CT = _ct_for(C, f.dtype)
    G = _G if py.shape[1] % _G == 0 else py.shape[1]

    def cost(h):
        f_blk = 2 * h * W * CT * f.dtype.itemsize  # double-buffered
        a_blk = (G * ph) * W * CT * 4  # f32 stage-1 intermediate
        o_blk = 3 * G * ph * pw * CT * 4  # f32 out acc + transpose + out
        return f_blk + a_blk + o_blk

    hs = _chunk_h(H, lambda h: cost(h) <= _FWD_BUDGET)
    if hs == H:
        return _level_call_fwd_part(f, py, px, mask, interpret)
    out = None
    for s in range(0, H, hs):
        e = min(s + hs, H)
        o = _level_call_fwd_part(
            f[:, s:e], py[..., s:e], px, mask, interpret,
        )
        out = o if out is None else out + o
    return out


def _chunk_h(H: int, fits) -> int:
    """Largest ceil-div chunk size whose working set fits the VMEM budget.
    Non-power-of-two H (eval shortest-edge buckets, e.g. P2 H=200) gets an
    uneven final chunk instead of stalling above the 16 MB scoped-VMEM limit
    when no power-of-two divisor exists."""
    n = 1
    while not fits(-(-H // n)) and n < H:
        n += 1
    return -(-H // n)


def _level_call_fwd_part(f, py, px, mask, interpret: bool):
    B, H, W, C = f.shape
    _, R, ph, _ = py.shape
    pw = px.shape[2]
    CT = _ct_for(C, f.dtype)
    G = _G if R % _G == 0 else R
    grid = (B, C // CT, R // G)
    py2 = py.reshape(B, R * ph, H)  # roi-major row blocks (see _fwd_kernel)
    px2 = jnp.swapaxes(px, 2, 3)  # (B, R, W, pw): W-major (see _fwd_kernel)

    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, G * ph, H), lambda b, ct, g, m_: (b, g, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, G, W, pw), lambda b, ct, g, m_: (b, g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, H, W, CT), lambda b, ct, g, m_: (b, 0, 0, ct),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, G, ph, pw, CT), lambda b, ct, g, m_: (b, g, 0, 0, ct),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, R, ph, pw, C), f.dtype),
        interpret=interpret,
    )(mask, py2, px2, f)


def _level_call_bwd(grads, f_shape, f_dtype, py, px, mask, interpret: bool):
    """dF for one level; splits the H axis across pallas calls so the f32
    VMEM accumulator stays under budget (P2 at CT=128 would need 13 MB)."""
    B, H, W, C = f_shape
    CT = _ct_for(C, f_dtype)
    hs = _chunk_h(H, lambda h: h * W * CT * 4 <= _ACC_BUDGET)
    if hs == H:
        return _level_call_bwd_part(grads, f_shape, f_dtype, py, px, mask,
                                    interpret)
    parts = [
        _level_call_bwd_part(
            grads, (B, min(s + hs, H) - s, W, C), f_dtype,
            py[:, :, :, s:min(s + hs, H)], px, mask, interpret,
        )
        for s in range(0, H, hs)
    ]
    return jnp.concatenate(parts, axis=1)


def _level_call_bwd_part(grads, f_shape, f_dtype, py, px, mask,
                         interpret: bool):
    B, H, W, C = f_shape
    _, R, ph, _ = py.shape
    pw = px.shape[2]
    CT = _ct_for(C, f_dtype)
    G = _G if R % _G == 0 else R
    grid = (B, C // CT, R // G)
    py2 = py.reshape(B, R * ph, H)  # roi-major row blocks (see _fwd_kernel)
    px2 = jnp.swapaxes(px, 2, 3)  # (B, R, W, pw): W-major (see _fwd_kernel)

    return pl.pallas_call(
        _bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, G * ph, H), lambda b, ct, g, m_: (b, g, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, G, W, pw), lambda b, ct, g, m_: (b, g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, G, ph, pw, CT), lambda b, ct, g, m_: (b, g, 0, 0, ct),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, H, W, CT), lambda b, ct, g, m_: (b, 0, 0, ct),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((H, W, CT), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), f_dtype),
        interpret=interpret,
    )(mask, py2, px2, grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def multilevel_roi_align_fused(
    features: Tuple[jnp.ndarray, ...],
    rois,  # (B, R, 4); receives an identically-zero cotangent
    strides: Sequence[int],
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    aligned: bool = True,
    canonical_level: int = 4,
    canonical_box_size: int = 224,
    interpret: bool = False,
):
    """Batched multilevel RoIAlign (B, R, ph, pw, C) via the Pallas kernels.

    ``features``: tuple of per-level (B, H_l, W_l, C). Gradients flow to
    ``features`` only; dRoIs ≡ 0 (proposals are detached in the reference
    and at every call site here — faster_rcnn.py stop_gradient's them).
    """
    out, _ = _fused_fwd(
        features, rois, strides, output_size, sampling_ratio, aligned,
        canonical_level, canonical_box_size, interpret,
    )
    return out


def pool_rois_multilevel(
    features: List[jnp.ndarray],
    rois: jnp.ndarray,  # (B, R, 4)
    strides: Sequence[int],
    output_size: Tuple[int, int] = (7, 7),
) -> jnp.ndarray:
    """Backend-dispatched batched multilevel RoIAlign → (B, R, ph, pw, C).

    TPU: fused Pallas kernels (this module). Other backends: the XLA
    separable formulation (same math, tested equivalent). Pads the roi count
    to the kernel's group size; padding rois are zero-area and their outputs
    are sliced off."""
    from basedet_tpu.ops.roi_align_separable import (
        multilevel_roi_align_batched,
    )

    # Pallas path needs: TPU backend, C a multiple of 128 (Mosaic lane-dim
    # block constraint), bf16 features (the f32 VMEM working set at P2 does
    # not fit). Production detection runs AMP bf16 with C=256.
    # BASEDET_ROIALIGN_BACKEND={pallas,window,xla} forces a path
    # (A/B benchmarking): pallas = v2 dense-separable, window = v3
    # Morton-clustered windows (ops/roi_align_window.py).
    import os

    force = os.environ.get("BASEDET_ROIALIGN_BACKEND")
    supported = (
        jax.default_backend() == "tpu"
        and features[0].dtype == jnp.bfloat16
        and features[0].shape[-1] % 128 == 0
    )
    if force in ("pallas", "window") and not supported:
        # fail loudly: silently timing the XLA path as "pallas" corrupts A/Bs
        raise ValueError(
            f"BASEDET_ROIALIGN_BACKEND={force} but the fused kernel needs "
            "TPU + bf16 features + C % 128 == 0 "
            f"(backend={jax.default_backend()}, dtype={features[0].dtype}, "
            f"C={features[0].shape[-1]})"
        )
    if force == "window" or (supported and force is None):
        # v3 windows are the TPU default: in-train FRCNN b8@640 A/B
        # 110.5 vs 104.3 img/s over v2 dense (benchmark.json, round 4),
        # hardware equality gates green (tools/tpu_checks 4b/4c)
        from basedet_tpu.ops.roi_align_window import pool_rois_window

        return pool_rois_window(
            list(features), rois, strides, output_size
        )
    usable = supported and force != "xla"
    if not usable:
        return multilevel_roi_align_batched(
            list(features), rois, strides, output_size
        )
    B, R, _ = rois.shape
    Rp = ((R + _G - 1) // _G) * _G
    if Rp != R:
        rois = jnp.concatenate(
            [rois, jnp.zeros((B, Rp - R, 4), rois.dtype)], axis=1
        )
    out = multilevel_roi_align_fused(
        tuple(features), rois, tuple(strides), tuple(output_size)
    )
    return out[:, :R]


def _prepare(features, rois, strides, output_size, sampling_ratio, aligned,
             canonical_level, canonical_box_size):
    """Level sort + separable weights + group activity masks."""
    ph, pw = output_size
    B, R, _ = rois.shape
    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    lvl = roi_level_assignment(
        rois, min_level, max_level, canonical_level, canonical_box_size
    )  # (B, R)
    order = jnp.argsort(lvl, axis=1, stable=True)  # (B, R)
    rois_s = jnp.take_along_axis(rois, order[..., None], axis=1)
    lvl_s = jnp.take_along_axis(lvl, order, axis=1)

    G = _G if R % _G == 0 else R
    nrg = R // G
    lvl_groups = lvl_s.reshape(B, nrg, G)

    half = 0.5 if aligned else 0.0
    per_level = []
    for li, (feat, stride) in enumerate(zip(features, strides)):
        Bf, H, W, C = feat.shape
        scale = 1.0 / stride
        x1 = rois_s[..., 0] * scale - half
        y1 = rois_s[..., 1] * scale - half
        x2 = rois_s[..., 2] * scale - half
        y2 = rois_s[..., 3] * scale - half
        roi_w, roi_h = x2 - x1, y2 - y1
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        m = lvl_s == li
        py = jax.vmap(
            lambda a, b, mm: _axis_weights(
                a, b, ph, sampling_ratio, H, mm, feat.dtype
            )
        )(y1, roi_h / ph, m)  # (B, R, ph, H)
        px = jax.vmap(
            lambda a, b, mm: _axis_weights(
                a, b, pw, sampling_ratio, W, mm, feat.dtype
            )
        )(x1, roi_w / pw, m)
        mask = jnp.any(lvl_groups == li, axis=2).astype(jnp.int32)  # (B, nrg)
        per_level.append((py, px, mask))
    return per_level, order


def _fused_fwd(features, rois, strides, output_size, sampling_ratio, aligned,
               canonical_level, canonical_box_size, interpret):
    per_level, order = _prepare(
        features, rois, strides, output_size, sampling_ratio, aligned,
        canonical_level, canonical_box_size,
    )
    out = None
    for feat, (py, px, mask) in zip(features, per_level):
        o = _level_call_fwd(feat, py, px, mask, interpret)
        out = o if out is None else out + o
    # un-permute back to caller roi order
    inv = jnp.argsort(order, axis=1)
    out = jnp.take_along_axis(out, inv[:, :, None, None, None], axis=1)
    return out, (per_level, order)


def _fused_bwd(strides, output_size, sampling_ratio, aligned,
               canonical_level, canonical_box_size, interpret,
               residuals, g):
    per_level, order = residuals
    # g arrives in caller roi order; re-sort into level order
    g_s = jnp.take_along_axis(g, order[:, :, None, None, None], axis=1)
    C = g.shape[-1]
    dfs = []
    for py, px, mask in per_level:
        # per-level feature geometry is encoded in the weight shapes
        B, H, W = py.shape[0], py.shape[3], px.shape[3]
        dfs.append(
            _level_call_bwd(
                g_s.astype(py.dtype), (B, H, W, C), py.dtype, py, px, mask,
                interpret,
            )
        )
    drois = jnp.zeros(order.shape + (4,), g.dtype)
    return (tuple(dfs), drois)


def _fused_fwd_rule(features, rois, strides, output_size, sampling_ratio,
                    aligned, canonical_level, canonical_box_size, interpret):
    out, res = _fused_fwd(
        features, rois, strides, output_size, sampling_ratio, aligned,
        canonical_level, canonical_box_size, interpret,
    )
    return out, res


multilevel_roi_align_fused.defvjp(_fused_fwd_rule, _fused_bwd)

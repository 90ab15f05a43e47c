"""RoIAlign v3: Morton-clustered roi groups + per-group feature windows.

The v2 separable formulation (ops/roi_align_pallas.py) is spatially DENSE:
stage 1 contracts the full H axis of a level per roi group, so a 7x7 pool
of a P2-assigned roi pays a (G*ph, 160) x (160, W*CT) matmul even though
its bilinear support touches ~15 of the 160 rows — py is >90% zeros at P2
and the kernel burns ~10x the necessary MXU work (and grid steps: 4 levels
x C-tiles x H-chunks x 64 groups).

v3 exploits that RoIAlign is a *local* op:

  - RoIs are sorted by (FPN level, Morton code of the box center), so each
    group of G rois is level-pure AND spatially clustered.
  - ONE pallas call covers all levels: grid (B, R/G). Feature maps stay in
    HBM (memory_space=ANY); each grid step DMAs only its group's
    (Hw, Ww, C) window into VMEM scratch, with the level choice and window
    origin scalar-prefetched. Per-roi weights are built on the host
    directly in window coordinates (zero outside the window / level, so
    stale scratch beyond a small level's extent contributes exactly 0).
  - Groups that a single window cannot cover exactly (multi-level boundary
    groups, pathological aspect ratios) are routed to the v2 dense kernels
    by a group mask — the result is exact for every input, the window is
    purely a fast path.

Backward: dF accumulation is kept in the v2 chunked-accumulator scheme
(windowed per-group dF patches cannot be scatter-added on TPU), but the
stage-2 contraction is x-windowed (acc[:, sx:sx+Ww] += py_chunk^T @ u) and
per-(group, H-chunk) activity masks skip groups whose y-support does not
intersect the chunk — together ~5x less MXU work at P2 shapes.

Same semantics as ops/roi_align_separable.multilevel_roi_align_batched
(MegEngine F.nn.roi_align, average mode, aligned=True — the reference's
/root/reference/basedet/layers/common/roi_pool.py:12-78), tested equal in
interpret mode and gated on hardware by tools/tpu_checks.
"""
from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from basedet_tpu.ops.roi_align_pallas import (
    _level_call_bwd,
    _level_call_fwd,
)
from basedet_tpu.ops.roi_align_separable import (
    _axis_weights,
    roi_level_assignment,
)

_G = 8          # rois per group (static; pool entry pads R to a multiple)
_HW = 64        # window rows
_WW = 64        # window cols
_ACC_BUDGET = int(3.5 * 2**20)  # bwd f32 accumulator VMEM budget (bytes)


# -- host-side preparation -------------------------------------------------


def _morton16(cy: jnp.ndarray, cx: jnp.ndarray) -> jnp.ndarray:
    """Interleave two 8-bit coords into a 16-bit Z-order key."""
    code = jnp.zeros_like(cy)
    for i in range(8):
        code = code | (((cx >> i) & 1) << (2 * i)) \
                    | (((cy >> i) & 1) << (2 * i + 1))
    return code


def _roi_support(lo, bin_sz, pool_dim, sampling_ratio, size):
    """Conservative [rmin, rmax] (inclusive) row support of the bilinear
    weights along one axis, in feature coords."""
    S = sampling_ratio
    cmin = lo + (0.5 / S) * bin_sz
    cmax = lo + (pool_dim - 1 + (S - 0.5) / S) * bin_sz
    rmin = jnp.floor(jnp.clip(cmin, 0.0, size - 1.0))
    rmax = jnp.minimum(jnp.floor(jnp.clip(cmax, 0.0, size - 1.0)) + 1.0,
                       size - 1.0)
    return rmin.astype(jnp.int32), rmax.astype(jnp.int32)


def _axis_weights_win(lo_coord, bin_size, pool_dim, sampling_ratio, size,
                      mask, start, win, dtype):
    """(R, pool_dim, win) separable weights evaluated at window rows
    start + [0, win) of a size-`size` axis. Rows beyond `size` (windows of
    levels smaller than the global window) get zero weight, so the kernel
    may leave stale data in the scratch pad region."""
    S = sampling_ratio
    f32 = jnp.float32
    steps = (
        jnp.arange(pool_dim, dtype=f32)[None, :, None]
        + (jnp.arange(S, dtype=f32)[None, None, :] + 0.5) / S
    )  # (1, P, S)
    coords = lo_coord[:, None, None].astype(f32) + steps * bin_size[
        :, None, None
    ].astype(f32)  # (R, P, S)
    oob = (coords < -1.0) | (coords > size)
    c = jnp.clip(coords, 0.0, size - 1.0)
    lo = jnp.floor(c)
    hi = jnp.minimum(lo + 1.0, size - 1.0)
    lerp = c - lo
    grid = start[:, None].astype(f32) + jnp.arange(win, dtype=f32)[None]
    w_sample = jnp.where(oob, 0.0, 1.0) / S
    w = (
        (grid[:, None, None, :] == lo[..., None]) * (1.0 - lerp)[..., None]
        + (grid[:, None, None, :] == hi[..., None]) * lerp[..., None]
    ) * w_sample[..., None]
    w = jnp.sum(w, axis=2)  # (R, P, win)
    return (w * mask[:, None, None]).astype(dtype)


def _window_start(gmin, gmax, wl, size):
    """8-aligned window origin centered on the group support, clamped so
    the (wl)-row window stays in bounds. The clamp bound is also 8-aligned:
    the kernel promises `pl.multiple_of(start, 8)` to Mosaic, so a
    non-aligned clamp (size - wl not a multiple of 8) would be a lie —
    edge groups a shorter aligned window cannot cover route to the dense
    fallback instead."""
    s = (gmin + gmax + 1 - wl) // 2
    s = (s // 8) * 8
    return jnp.clip(s, 0, max(((size - wl) // 8) * 8, 0))


def _prepare_v3(features, rois, strides, output_size, sampling_ratio,
                aligned, canonical_level, canonical_box_size, hw, ww):
    """Level+Morton sort, windowed & dense weights, group schedule."""
    ph, pw = output_size
    B, R, _ = rois.shape
    nl = len(features)
    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    lvl = roi_level_assignment(
        rois, min_level, max_level, canonical_level, canonical_box_size
    )  # (B, R)

    img_h = features[0].shape[1] * strides[0]
    img_w = features[0].shape[2] * strides[0]
    cy = jnp.clip((rois[..., 1] + rois[..., 3]) * (128.0 / img_h),
                  0, 255).astype(jnp.int32)
    cx = jnp.clip((rois[..., 0] + rois[..., 2]) * (128.0 / img_w),
                  0, 255).astype(jnp.int32)
    key = lvl * (1 << 16) + _morton16(cy, cx)
    order = jnp.argsort(key, axis=1, stable=True)  # (B, R)
    rois_s = jnp.take_along_axis(rois, order[..., None], axis=1)
    lvl_s = jnp.take_along_axis(lvl, order, axis=1)

    G = _G if R % _G == 0 else R
    nrg = R // G

    half = 0.5 if aligned else 0.0
    py_w = jnp.zeros((B, R, ph, hw), features[0].dtype)
    px_w = jnp.zeros((B, R, pw, ww), features[0].dtype)
    act_l, sy_l, sx_l, cov_l, geom = [], [], [], [], []
    dense = []
    for li, (feat, stride) in enumerate(zip(features, strides)):
        H, W = feat.shape[1], feat.shape[2]
        hwl = min(hw, H)
        # W is the second-to-minor (sublane) axis of the feature memref:
        # Mosaic requires W-axis slice extents to be multiples of the tile
        # (8). Levels smaller than the window span the whole level rounded
        # up to 8 — _v3_fwd zero-pads those features so the DMA stays in
        # bounds (weight columns beyond W are zero, so padding is inert).
        wwl = min(ww, -(-W // 8) * 8)
        scale = 1.0 / stride
        x1 = rois_s[..., 0] * scale - half
        y1 = rois_s[..., 1] * scale - half
        x2 = rois_s[..., 2] * scale - half
        y2 = rois_s[..., 3] * scale - half
        roi_w, roi_h = x2 - x1, y2 - y1
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        # degenerate rois (x2 < x1 / y2 < y1) would flip the sample-coord
        # direction and make _roi_support's min/max ends unsound — the
        # `covered` gate could then pass while true bilinear support falls
        # outside the DMA'd window. Call sites clip proposals today; clamp
        # anyway so such a roi pools a point instead of corrupting output.
        roi_w = jnp.maximum(roi_w, 0.0)
        roi_h = jnp.maximum(roi_h, 0.0)
        m = lvl_s == li  # (B, R)

        rmin, rmax = _roi_support(y1, roi_h / ph, ph, sampling_ratio, H)
        cmin, cmax = _roi_support(x1, roi_w / pw, pw, sampling_ratio, W)
        mg = m.reshape(B, nrg, G)
        grmin = jnp.where(mg, rmin.reshape(B, nrg, G), H).min(-1)
        grmax = jnp.where(mg, rmax.reshape(B, nrg, G), -1).max(-1)
        gcmin = jnp.where(mg, cmin.reshape(B, nrg, G), W).min(-1)
        gcmax = jnp.where(mg, cmax.reshape(B, nrg, G), -1).max(-1)
        sy = _window_start(grmin, grmax, hwl, H)  # (B, nrg)
        sx = _window_start(gcmin, gcmax, wwl, W)
        covered = (
            (grmin >= sy) & (grmax < sy + hwl)
            & (gcmin >= sx) & (gcmax < sx + wwl)
        )
        act = mg.any(-1)  # (B, nrg)

        sy_r = jnp.repeat(sy, G, axis=1)  # (B, R)
        sx_r = jnp.repeat(sx, G, axis=1)
        py_w = py_w + jax.vmap(
            lambda a, b_, mm, s: _axis_weights_win(
                a, b_, ph, sampling_ratio, H, mm, s, hw, feat.dtype
            )
        )(y1, roi_h / ph, m, sy_r)
        px_w = px_w + jax.vmap(
            lambda a, b_, mm, s: _axis_weights_win(
                a, b_, pw, sampling_ratio, W, mm, s, ww, feat.dtype
            )
        )(x1, roi_w / pw, m, sx_r)

        py_d = jax.vmap(
            lambda a, b_, mm: _axis_weights(
                a, b_, ph, sampling_ratio, H, mm, feat.dtype
            )
        )(y1, roi_h / ph, m)  # (B, R, ph, H)
        px_d = jax.vmap(
            lambda a, b_, mm: _axis_weights(
                a, b_, pw, sampling_ratio, W, mm, feat.dtype
            )
        )(x1, roi_w / pw, m)

        act_l.append(act)
        sy_l.append(sy)
        sx_l.append(sx)
        cov_l.append(covered)
        geom.append((H, W, hwl, wwl))
        dense.append((py_d, px_d, grmin, grmax))

    act_all = jnp.stack(act_l)  # (nl, B, nrg)
    cov_all = jnp.stack(cov_l)
    cnt = act_all.sum(0)
    lvl_g = jnp.argmax(act_all, axis=0)  # (nl==0 rows -> 0, masked below)
    cov_sel = jnp.take_along_axis(cov_all, lvl_g[None], axis=0)[0]
    win_ok = (cnt == 1) & cov_sel
    lvl_sel = jnp.where(win_ok, lvl_g, -1).astype(jnp.int32)
    sy_sel = jnp.take_along_axis(jnp.stack(sy_l), lvl_g[None], axis=0)[0]
    sx_sel = jnp.take_along_axis(jnp.stack(sx_l), lvl_g[None], axis=0)[0]
    mask_ov = [
        (a & ~win_ok).astype(jnp.int32) for a in act_l
    ]  # per level: groups the window pass cannot serve

    return dict(
        order=order, py_w=py_w, px_w=px_w,
        lvl_sel=lvl_sel,
        sy=sy_sel.astype(jnp.int32), sx=sx_sel.astype(jnp.int32),
        act=[a.astype(jnp.int32) for a in act_l], win_ok=win_ok,
        mask_ov=mask_ov, dense=dense, geom=geom,
    )


# -- forward kernel ----------------------------------------------------------


def _fwd_kernel_win(lvl_ref, sy_ref, sx_ref, py_ref, px_ref, *rest,
                    geom, G, ph, pw):
    fs = rest[: len(geom)]
    out_ref = rest[len(geom)]
    win, sem = rest[len(geom) + 1:]
    b = pl.program_id(0)
    g = pl.program_id(1)
    lv = lvl_ref[b, g]

    @pl.when((b == 0) & (g == 0))
    def _init():
        # stale-pad hygiene: weights are zero beyond a level's extent, but
        # 0 * uninitialized could be NaN on the very first touch
        win[...] = jnp.zeros_like(win)

    @pl.when(lv < 0)
    def _skip():
        out_ref[...] = jnp.zeros_like(out_ref)

    for li, f_hbm in enumerate(fs):
        H, W, hwl, wwl = geom[li]

        @pl.when(lv == li)
        def _fetch(f_hbm=f_hbm, hwl=hwl, wwl=wwl):
            sy = pl.multiple_of(sy_ref[b, g], 8)
            sx = pl.multiple_of(sx_ref[b, g], 8)
            dma = pltpu.make_async_copy(
                f_hbm.at[b, pl.ds(sy, hwl), pl.ds(sx, wwl), :],
                win.at[pl.ds(0, hwl), pl.ds(0, wwl), :],
                sem,
            )
            dma.start()
            dma.wait()

    @pl.when(lv >= 0)
    def _compute():
        # stage 1: contract window rows (same 2D-lhs form as v2)
        a = jax.lax.dot_general(
            py_ref[0],  # (G*ph, Hw)
            win[...],  # (Hw, Ww, C)
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G*ph, Ww, C)
        a4 = a.reshape(G, ph, a.shape[1], a.shape[2])
        o = jax.lax.dot_general(
            px_ref[0],  # (G, Ww, pw)
            a4,  # (G, ph, Ww, C)
            (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, pw, ph, C)
        out_ref[0] = jnp.transpose(o, (0, 2, 1, 3)).astype(out_ref.dtype)


def _call_fwd_win(features, py_w, px_w, lvl_sel, sy, sx, geom,
                  interpret: bool):
    B, R, ph, hw = py_w.shape
    pw, ww = px_w.shape[2], px_w.shape[3]
    C = features[0].shape[-1]
    G = _G if R % _G == 0 else R
    nrg = R // G
    py2 = py_w.reshape(B, R * ph, hw)
    px2 = jnp.swapaxes(px_w, 2, 3)  # (B, R, Ww, pw)

    kernel = functools.partial(
        _fwd_kernel_win, geom=tuple(geom), G=G, ph=ph, pw=pw
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, nrg),
            in_specs=[
                pl.BlockSpec(
                    (1, G * ph, hw), lambda b, g, *_: (b, g, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, G, ww, pw), lambda b, g, *_: (b, g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(features),
            out_specs=pl.BlockSpec(
                (1, G, ph, pw, C), lambda b, g, *_: (b, g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((hw, ww, C), features[0].dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, R, ph, pw, C), features[0].dtype),
        interpret=interpret,
    )(lvl_sel, sy, sx, py2, px2, *features)


# -- backward kernel ---------------------------------------------------------


def _bwd_kernel_win(mask_ref, sx_ref, py_ref, px_ref, g_ref, df_ref,
                    acc_ref):
    """Chunked-accumulator dF with x-windowed stage 2.

    py (1, 1, 1, hs, G*ph): one H-chunk of the dense y-weights, pre-chunked
    on the host (the (B, R*ph, H) layout cannot be lane-sliced at hs<128 —
    Mosaic requires lane blocks to be 128-divisible or span the axis, so
    the chunk axis is hoisted into the grid dims and hs sits on sublanes);
    px (1, G, Ww, pw) windowed; g (1, G, ph, pw, CT); df (1, hs, W, CT);
    acc (hs, W, CT) f32 scratch;
    mask (B, NC, NRG) = active-here AND window-covered AND chunk-intersecting.
    """
    b = pl.program_id(0)
    c = pl.program_id(2)
    g = pl.program_id(3)
    n_g = pl.num_programs(3)
    ph = g_ref.shape[2]
    G = g_ref.shape[1]

    @pl.when(g == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(mask_ref[b, c, g] != 0)
    def _compute():
        u = jax.lax.dot_general(
            px_ref[0],  # (G, Ww, pw)
            g_ref[0],  # (G, ph, pw, CT)
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, Ww, ph, CT)
        u2 = jnp.transpose(u, (0, 2, 1, 3))
        u2 = u2.reshape(G * ph, u2.shape[2], u2.shape[3])
        v = jax.lax.dot_general(
            py_ref[0, 0, 0],  # (hs, G*ph)
            u2,  # (G*ph, Ww, CT)
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (hs, Ww, CT)
        sx = pl.multiple_of(sx_ref[b, g], 8)
        acc_ref[:, pl.ds(sx, v.shape[1]), :] = (
            acc_ref[:, pl.ds(sx, v.shape[1]), :] + v
        )

    @pl.when(g == n_g - 1)
    def _flush():
        df_ref[0] = acc_ref[...].astype(df_ref.dtype)


def _chunk_rows(H: int, W: int, CT: int) -> int:
    hs = H
    while hs > 8 and hs * W * CT * 4 > _ACC_BUDGET:
        # halve toward a multiple of 8; uneven tail handled by ceil-div grid
        hs = max(8, ((hs // 2) + 7) // 8 * 8)
    return hs


def _call_bwd_win(grads, f_shape, f_dtype, py_d, px_w, sx, mask_bcg,
                  interpret: bool):
    """grads (B, R, ph, pw, C) level-sorted; returns dF (B, H, W, C)."""
    B, H, W, C = f_shape
    _, R, ph, _ = py_d.shape
    pw, ww = px_w.shape[2], px_w.shape[3]
    CT = 128 if C % 128 == 0 else C
    G = _G if R % _G == 0 else R
    nrg = R // G
    hs = _chunk_rows(H, W, CT)
    nc = -(-H // hs)
    # pre-chunk py to (B, nc, nrg, hs, G*ph): the trailing block dims
    # (hs, G*ph) then span their axes exactly (Mosaic lane/sublane
    # legality); padded tail-chunk rows carry zero weight -> contribute 0
    py_t = jnp.swapaxes(py_d.reshape(B, R * ph, H), 1, 2)  # (B, H, R*ph)
    if nc * hs != H:
        py_t = jnp.pad(py_t, ((0, 0), (0, nc * hs - H), (0, 0)))
    py_c = py_t.reshape(B, nc, hs, nrg, G * ph).transpose(0, 1, 3, 2, 4)
    px2 = jnp.swapaxes(px_w, 2, 3)  # (B, R, Ww, pw)

    return pl.pallas_call(
        _bwd_kernel_win,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, C // CT, nc, nrg),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 1, hs, G * ph),
                    lambda b, ct, c, g, *_: (b, c, g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, G, ww, pw), lambda b, ct, c, g, *_: (b, g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, G, ph, pw, CT),
                    lambda b, ct, c, g, *_: (b, g, 0, 0, ct),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, hs, W, CT), lambda b, ct, c, g, *_: (b, c, 0, ct),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((hs, W, CT), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), f_dtype),
        interpret=interpret,
    )(mask_bcg, sx, py_c, px2, grads)


# -- multilevel entry with custom VJP ----------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def multilevel_roi_align_window(
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
    out, _ = _v3_fwd(
        features, rois, strides, output_size, sampling_ratio, aligned,
        canonical_level, canonical_box_size, interpret,
    )
    return out


def _v3_fwd(features, rois, strides, output_size, sampling_ratio, aligned,
            canonical_level, canonical_box_size, interpret):
    p = _prepare_v3(
        features, rois, strides, output_size, sampling_ratio, aligned,
        canonical_level, canonical_box_size, _HW, _WW,
    )
    # levels narrower than their (8-aligned) window extent get zero-padded
    # W so the window DMA slice is in bounds; the padded columns carry zero
    # weight in px_w, so they contribute exactly 0
    feats_w = tuple(
        jnp.pad(f, ((0, 0), (0, 0), (0, wwl - f.shape[2]), (0, 0)))
        if wwl > f.shape[2] else f
        for f, (_, _, _, wwl) in zip(features, p["geom"])
    )
    out = _call_fwd_win(
        feats_w, p["py_w"], p["px_w"], p["lvl_sel"], p["sy"], p["sx"],
        p["geom"], interpret,
    )

    # exactness fallback: boundary / uncovered groups via the dense kernels.
    # The dense kernels group at their own _G (8); our group size may be a
    # multiple of it — repeat the mask to subgroup granularity.
    from basedet_tpu.ops.roi_align_pallas import _G as _G_DENSE

    rep = max(_G // _G_DENSE, 1)
    mask_ov_d = [jnp.repeat(m, rep, axis=1) for m in p["mask_ov"]]
    any_ov = sum(m.sum() for m in p["mask_ov"]) > 0

    def ov_branch(feats):
        o = None
        for feat, (py_d, px_d, _, _), m_ov in zip(
            feats, p["dense"], mask_ov_d
        ):
            x = _level_call_fwd(feat, py_d, px_d, m_ov, interpret)
            o = x if o is None else o + x
        return o

    out = out + jax.lax.cond(
        any_ov, ov_branch, lambda feats: jnp.zeros_like(out), features
    )

    inv = jnp.argsort(p["order"], axis=1)
    out_u = jnp.take_along_axis(out, inv[:, :, None, None, None], axis=1)
    # residuals must be a pytree of arrays: geometry is derivable in bwd
    # from the dense weight shapes (py_d: (B,R,ph,H), px_d: (B,R,pw,W))
    res = {k: v for k, v in p.items() if k != "geom"}
    return out_u, res


def _v3_fwd_rule(features, rois, strides, output_size, sampling_ratio,
                 aligned, canonical_level, canonical_box_size, interpret):
    return _v3_fwd(
        features, rois, strides, output_size, sampling_ratio, aligned,
        canonical_level, canonical_box_size, interpret,
    )


def _v3_bwd(strides, output_size, sampling_ratio, aligned, canonical_level,
            canonical_box_size, interpret, res, g):
    p = res
    order = p["order"]
    B, R = order.shape
    C = g.shape[-1]
    f_dtype = p["py_w"].dtype
    g_s = jnp.take_along_axis(
        g, order[:, :, None, None, None], axis=1
    ).astype(f_dtype)

    dfs = []
    for li, (py_d, px_d, grmin, grmax) in enumerate(p["dense"]):
        H, W = py_d.shape[3], px_d.shape[3]
        f_shape = (B, H, W, C)
        wwl = min(p["px_w"].shape[3], W)
        act = p["act"][li]
        win_here = (
            (p["lvl_sel"] == li) & (act != 0)
        )
        if wwl == p["px_w"].shape[3] and W >= wwl:
            # windowed backward for this level; chunk-intersection masks
            CT = 128 if C % 128 == 0 else C
            hs = _chunk_rows(H, W, CT)
            nc = -(-H // hs)
            c0 = jnp.arange(nc, dtype=jnp.int32)[None, :, None] * hs
            c1 = jnp.minimum(c0 + hs, H)
            inter = (grmin[:, None, :] < c1) & (grmax[:, None, :] >= c0)
            mask_bcg = (
                win_here[:, None, :] & inter
            ).astype(jnp.int32)  # (B, NC, NRG)
            dfs.append(
                _call_bwd_win(
                    g_s, f_shape, f_dtype, py_d, p["px_w"], p["sx"],
                    mask_bcg, interpret,
                )
            )
            m_dense = p["mask_ov"][li]
        else:
            # small level (W < Ww): dense backward for all active groups
            m_dense = act

        # dense kernels group at their own _G (8) — subgroup granularity
        from basedet_tpu.ops.roi_align_pallas import _G as _G_DENSE

        m_dense = jnp.repeat(m_dense, max(_G // _G_DENSE, 1), axis=1)
        any_d = m_dense.sum() > 0
        df_d = jax.lax.cond(
            any_d,
            lambda: _level_call_bwd(
                g_s, f_shape, f_dtype, py_d, px_d, m_dense, interpret
            ),
            lambda: jnp.zeros(f_shape, f_dtype),
        )
        if wwl == p["px_w"].shape[3] and W >= wwl:
            dfs[-1] = dfs[-1] + df_d
        else:
            dfs.append(df_d)

    drois = jnp.zeros(order.shape + (4,), g.dtype)
    return (tuple(dfs), drois)


multilevel_roi_align_window.defvjp(_v3_fwd_rule, _v3_bwd)


def pool_rois_window(
    features: List[jnp.ndarray],
    rois: jnp.ndarray,  # (B, R, 4)
    strides: Sequence[int],
    output_size: Tuple[int, int] = (7, 7),
    interpret: bool = False,
) -> jnp.ndarray:
    """v3 window-kernel multilevel RoIAlign → (B, R, ph, pw, C).

    Pads the roi count to the group size; padding rois are zero-area and
    their outputs are sliced off. Caller guarantees TPU + C % 128 == 0
    (the pool_rois_multilevel dispatcher checks)."""
    B, R, _ = rois.shape
    Rp = ((R + _G - 1) // _G) * _G
    if Rp != R:
        rois = jnp.concatenate(
            [rois, jnp.zeros((B, Rp - R, 4), rois.dtype)], axis=1
        )
    out = multilevel_roi_align_window(
        tuple(features), rois, tuple(strides), tuple(output_size),
        interpret=interpret,
    )
    return out[:, :R]

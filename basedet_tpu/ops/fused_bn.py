"""Fused 1x1-conv + train-BN epilogue chain (Pallas, TPU).

Round-3 evidence (docs/ROADMAP.md, playground/probe_packed_s1.py): the
dark2/dark3 CSP stages run at 16-19 TF/s not because the convs underfill
the MXU (a plain 3x3 32->32 @160 reaches 54-74 TF/s standalone) but
because TRAIN-MODE BatchNorm makes them HBM-bandwidth-bound: per conv,
XLA writes the conv output, re-reads it for the batch-stats reduction,
re-reads it to normalize, writes the normalized+SiLU activation, and the
next conv reads that — ~5 full passes over ~420 MB tensors.

This module restructures the chain so each activation crosses HBM twice:

  * every 1x1 conv is a Pallas GEMM whose EPILOGUE accumulates the
    per-channel sum / sum-of-squares of its (bf16) output while the tile
    is still in VMEM — the stats pass costs zero extra HBM reads;
  * the conv output is stored RAW (pre-BN); mean/rsigma are tiny (C,)
    vectors computed in plain jnp from the fused sums;
  * the CONSUMER kernel applies the BN affine + SiLU in its PROLOGUE
    while loading the raw tile for its own GEMM — normalize costs zero
    extra HBM traffic. Shortcut sums and channel-concats fold into the
    same prologue (a sum of normalized raw terms; a concat-GEMM is two
    half-K GEMMs added).

Backward is exact BN-through-batch-stats autodiff by construction: the
primitive exposes (y_raw, sum, sumsq) and the VJP returns cotangents for
every input INCLUDING the per-channel (scale, shift) vectors; mean/var →
(scale, shift) prefolds are differentiable jnp glue, so d(stats) flows
back into the producer kernel's VJP exactly as in textbook BN backward.

Capability analogue: the train-mode half of MegEngine's fused
ConvBnActivation (the reference relies on cuDNN fused conv+BN epilogues
via M.ConvBnRelu2d-style modules; basedet composes M.Conv2d + M.BatchNorm2d
— /root/reference/basedet/layers/blocks/yolo_block.py:11-33 — and leaves
the fusion to MegEngine's graph optimizer).

Terms API
---------
A fused GEMM call is a list of *terms*, each contributing ``act_t @ w_t``
to the same output:

  ("act",  x_bf16 (M,K), w (K,N))            # x is already an activation
  ("raw",  [(x_raw (M,K), scale (K,), shift (K,)), ...], w (K,N))
           # act = sum_j silu(x_j * scale_j + shift_j)  (shortcut sums)

Output: (y_raw (M,N) bf16, s (N,) f32, ss (N,) f32) where s/ss are the
per-channel sum and sum-of-squares of the bf16-rounded y (stats computed
on exactly the values consumers will re-read).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu_f32(p):
    return p * jax.nn.sigmoid(p)


def _dsilu_f32(p):
    s = jax.nn.sigmoid(p)
    return s * (1.0 + p * (1.0 - s))


# ---------------------------------------------------------------------------
# flatten/unflatten of the terms structure (custom_vjp over flat lists)
# ---------------------------------------------------------------------------

def _flatten_terms(terms):
    """-> (spec, flat arrays). spec is hashable/static."""
    spec = []
    flat = []
    for t in terms:
        kind = t[0]
        if kind == "act":
            _, x, w = t
            spec.append(("act",))
            flat += [x, w]
        elif kind == "raw":
            _, raws, w = t
            spec.append(("raw", len(raws)))
            for x, scale, shift in raws:
                flat += [x, scale, shift]
            flat.append(w)
        else:
            raise ValueError(kind)
    return tuple(spec), flat


def _iter_terms(spec, flat):
    """Yield (kind, parts...) pulling from flat list."""
    i = 0
    for s in spec:
        if s[0] == "act":
            yield ("act", flat[i], flat[i + 1])
            i += 2
        else:
            n = s[1]
            raws = []
            for _ in range(n):
                raws.append((flat[i], flat[i + 1], flat[i + 2]))
                i += 3
            yield ("raw", raws, flat[i])
            i += 1
    assert i == len(flat)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _choose_tm(M: int, want: int = 2048) -> int:
    """Largest TM <= want that divides M AND is a multiple of 8 — Mosaic
    requires the sublane block dim divisible by 8 unless the block spans
    the whole array. Falls back to M (full-array block, always legal)
    when no such divisor exists (e.g. M = 4 * odd)."""
    if M <= want:
        return M
    best = 0
    for tm in range(8, want + 1, 8):
        if M % tm == 0:
            best = tm
    return best or M


_VMEM_BUDGET = 10 * 2**20  # scoped-vmem limit is 16M; leave headroom


def _choose_tm_vmem(M: int, row_bytes: int, resident_bytes: int,
                    want: int = 2048) -> int:
    """Largest TM (divisor of M, <= want) whose VMEM footprint fits:
    M-tiled operands are double-buffered by the Pallas pipeline, so they
    cost 2 * TM * row_bytes on top of the grid-resident tensors."""
    tm = _choose_tm(M, want)
    while tm > 8 and 2 * tm * row_bytes + resident_bytes > _VMEM_BUDGET:
        smaller = _choose_tm(M, tm // 2)
        if smaller >= tm:  # no smaller legal tile exists
            break
        tm = smaller
    return tm


def _nbytes(shape, dtype) -> int:
    return int(np.prod(shape)) * jnp.dtype(dtype).itemsize


def _fwd_kernel(spec, n_out, *refs):
    """refs layout: inputs (per flatten order), then y_ref, s_ref, ss_ref."""
    ins = refs[:-3]
    y_ref, s_ref, ss_ref = refs[-3:]
    step = pl.program_id(0)

    acc = None
    for kind, *parts in _iter_terms(spec, list(ins)):
        if kind == "act":
            x_ref, w_ref = parts
            a = x_ref[...]
        else:
            raws, w_ref = parts
            a = None
            for x_ref, sc_ref, sh_ref in raws:
                xf = x_ref[...].astype(jnp.float32)
                pre = xf * sc_ref[...] + sh_ref[...]
                term = _silu_f32(pre)
                a = term if a is None else a + term
            a = a.astype(jnp.bfloat16)
        d = jnp.dot(a, w_ref[...], preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d

    y16 = acc.astype(jnp.bfloat16)
    y_ref[...] = y16
    yf = y16.astype(jnp.float32)

    @pl.when(step == 0)
    def _():
        s_ref[...] = jnp.zeros(s_ref.shape, s_ref.dtype)
        ss_ref[...] = jnp.zeros(ss_ref.shape, ss_ref.dtype)

    s_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
    ss_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _fwd_call(spec, flat, *, interpret=False, tm=2048):
    # shapes
    first_x = flat[0]
    M = first_x.shape[0]
    # find N from first weight
    n_out = None
    for kind, *parts in _iter_terms(spec, flat):
        n_out = parts[-1].shape[-1]
        break
    row_bytes = sum(
        a.shape[1] * a.dtype.itemsize
        for a in flat if a.ndim == 2 and a.shape[0] == M
    ) + n_out * 2  # + y tile (bf16)
    resident = sum(
        _nbytes(a.shape, a.dtype)
        for a in flat if not (a.ndim == 2 and a.shape[0] == M)
    ) + 2 * n_out * 4  # + s/ss accumulators
    TM = _choose_tm_vmem(M, row_bytes, resident, tm)
    grid = (M // TM,)

    in_specs = []
    args = []
    for a in flat:
        if a.ndim == 2 and a.shape[0] == M:  # M-tiled tensor
            in_specs.append(
                pl.BlockSpec((TM, a.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(a)
        elif a.ndim == 1:  # per-channel vector -> (1, K) resident
            v = a.reshape(1, -1)
            in_specs.append(
                pl.BlockSpec((1, v.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(v)
        else:  # weight (K, N) resident
            in_specs.append(
                pl.BlockSpec(a.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(a)

    out_shape = (
        jax.ShapeDtypeStruct((M, n_out), jnp.bfloat16),
        jax.ShapeDtypeStruct((1, n_out), jnp.float32),
        jax.ShapeDtypeStruct((1, n_out), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((TM, n_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_fwd_kernel, spec, n_out)
    y, s, ss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    return y, s[0], ss[0]


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(spec, n_out, *refs):
    """inputs: flat inputs..., y_raw, dy, ds, dss
    outputs: per flat-M-tensor dx..., per weight dw (f32 acc),
             per raw (dscale, dshift) (f32 acc)."""
    # split refs by walking the spec twice (inputs then outputs)
    n_in = 0
    for s in spec:
        n_in += 2 if s[0] == "act" else 3 * s[1] + 1
    ins = refs[:n_in]
    y_ref, dy_ref, ds_ref, dss_ref = refs[n_in:n_in + 4]
    outs = refs[n_in + 4:]
    step = pl.program_id(0)

    dy = dy_ref[...].astype(jnp.float32)
    y = y_ref[...].astype(jnp.float32)
    dy_eff = dy + ds_ref[...] + 2.0 * y * dss_ref[...]
    dy16 = dy_eff.astype(jnp.bfloat16)

    o = 0  # walking output refs
    for kind, *parts in _iter_terms(spec, list(ins)):
        if kind == "act":
            x_ref, w_ref = parts
            # dact = dy_eff @ w.T ; dw = act.T @ dy_eff
            dx_ref, dw_ref = outs[o], outs[o + 1]
            o += 2
            dact = jax.lax.dot_general(
                dy16, w_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dx_ref[...] = dact.astype(dx_ref.dtype)
            dw = jax.lax.dot_general(
                x_ref[...], dy16,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            @pl.when(step == 0)
            def _():
                dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

            dw_ref[...] += dw
        else:
            raws, w_ref = parts
            # recompute act
            a = None
            pres = []
            xfs = []
            for x_ref, sc_ref, sh_ref in raws:
                xf = x_ref[...].astype(jnp.float32)
                pre = xf * sc_ref[...] + sh_ref[...]
                xfs.append(xf)
                pres.append(pre)
                term = _silu_f32(pre)
                a = term if a is None else a + term
            a16 = a.astype(jnp.bfloat16)
            dact = jax.lax.dot_general(
                dy16, w_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw = jax.lax.dot_general(
                a16, dy16,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            refs_here = [outs[o + 3 * j] for j in range(len(raws))]
            dsc_refs = [outs[o + 3 * j + 1] for j in range(len(raws))]
            dsh_refs = [outs[o + 3 * j + 2] for j in range(len(raws))]
            dw_ref = outs[o + 3 * len(raws)]
            o += 3 * len(raws) + 1

            @pl.when(step == 0)
            def _():
                dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
                for j in range(len(raws)):
                    dsc_refs[j][...] = jnp.zeros(
                        dsc_refs[j].shape, dsc_refs[j].dtype
                    )
                    dsh_refs[j][...] = jnp.zeros(
                        dsh_refs[j].shape, dsh_refs[j].dtype
                    )

            dw_ref[...] += dw
            for j, (x_ref, sc_ref, sh_ref) in enumerate(raws):
                g = dact * _dsilu_f32(pres[j])
                refs_here[j][...] = (g * sc_ref[...]).astype(
                    refs_here[j].dtype
                )
                dsc_refs[j][...] += jnp.sum(
                    g * xfs[j], axis=0, keepdims=True
                )
                dsh_refs[j][...] += jnp.sum(g, axis=0, keepdims=True)


def _bwd_call(spec, flat, y, dy, ds, dss, *, interpret=False, tm=2048):
    M = y.shape[0]
    n_out = y.shape[1]
    # rows: every M-tiled input, its dx output, plus y and dy tiles
    m_inputs = [a for a in flat if a.ndim == 2 and a.shape[0] == M]
    row_bytes = (
        2 * sum(a.shape[1] * a.dtype.itemsize for a in m_inputs)
        + 2 * n_out * 2
    )
    resident = sum(
        _nbytes(a.shape, a.dtype)
        for a in flat if not (a.ndim == 2 and a.shape[0] == M)
    ) * 2  # weights + their f32 grad accumulators (~2x)
    TM = _choose_tm_vmem(M, row_bytes, resident, tm)
    grid = (M // TM,)

    def spec_for(a):
        if a.ndim == 2 and a.shape[0] == M:
            return pl.BlockSpec((TM, a.shape[1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        if a.ndim == 1:
            return pl.BlockSpec((1, a.shape[0]), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs, args = [], []
    for a in flat:
        in_specs.append(spec_for(a))
        args.append(a.reshape(1, -1) if a.ndim == 1 else a)
    for a, blk in ((y, None), (dy, None)):
        in_specs.append(
            pl.BlockSpec((TM, n_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(a)
    for a in (ds, dss):
        in_specs.append(
            pl.BlockSpec((1, n_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(a.reshape(1, -1))

    # outputs mirror inputs: dx per M-tensor, f32 acc per w/scale/shift
    out_shape, out_specs = [], []

    def add_m_out(shape, dtype):
        out_shape.append(jax.ShapeDtypeStruct((M, shape), dtype))
        out_specs.append(
            pl.BlockSpec((TM, shape), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )

    def add_acc(shape):
        out_shape.append(jax.ShapeDtypeStruct(shape, jnp.float32))
        out_specs.append(
            pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                         memory_space=pltpu.VMEM)
        )

    for kind, *parts in _iter_terms(spec, flat):
        if kind == "act":
            x, w = parts
            add_m_out(x.shape[1], x.dtype)
            add_acc(w.shape)
        else:
            raws, w = parts
            for x, sc, sh in raws:
                add_m_out(x.shape[1], x.dtype)
                add_acc((1, sc.shape[0]))
                add_acc((1, sh.shape[0]))
            add_acc(w.shape)

    kernel = functools.partial(_bwd_kernel, spec, n_out)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*args)

    # repack cotangents to match flat inputs
    cts = []
    o = 0
    for kind, *parts in _iter_terms(spec, flat):
        if kind == "act":
            x, w = parts
            cts += [outs[o], outs[o + 1].astype(w.dtype)]
            o += 2
        else:
            raws, w = parts
            for j, (x, sc, sh) in enumerate(raws):
                cts += [
                    outs[o + 3 * j],
                    outs[o + 3 * j + 1][0].astype(sc.dtype),
                    outs[o + 3 * j + 2][0].astype(sh.dtype),
                ]
            cts.append(outs[o + 3 * len(raws)].astype(w.dtype))
            o += 3 * len(raws) + 1
    return cts


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2, 3))
def _fused_gemm_flat(spec, flat, interpret, tm):
    return _fwd_call(spec, list(flat), interpret=interpret, tm=tm)


def _fused_gemm_fwd(spec, flat, interpret, tm):
    y, s, ss = _fwd_call(spec, list(flat), interpret=interpret, tm=tm)
    return (y, s, ss), (tuple(flat), y)


def _fused_gemm_bwd(spec, interpret, tm, res, cts):
    flat, y = res
    dy, ds, dss = cts
    dy = jnp.zeros_like(y) if dy is None else dy
    if ds is None:
        ds = jnp.zeros((y.shape[1],), jnp.float32)
    if dss is None:
        dss = jnp.zeros((y.shape[1],), jnp.float32)
    d_flat = _bwd_call(spec, list(flat), y, dy.astype(jnp.bfloat16),
                       ds, dss, interpret=interpret, tm=tm)
    return (tuple(d_flat),)


_fused_gemm_flat.defvjp(_fused_gemm_fwd, _fused_gemm_bwd)


def fused_gemm_stats(terms, *, interpret=False, tm=2048):
    """y_raw (M,N) bf16, s (N,) f32, ss (N,) f32. See module docstring."""
    spec, flat = _flatten_terms(terms)
    return _fused_gemm_flat(spec, tuple(flat), interpret, tm)


# ---------------------------------------------------------------------------
# jnp oracle (used by tests and as the CPU fallback)
# ---------------------------------------------------------------------------

def fused_gemm_stats_oracle(terms):
    acc = None
    for t in terms:
        if t[0] == "act":
            _, x, w = t
            a = x
        else:
            _, raws, w = t
            a = None
            for x, scale, shift in raws:
                pre = x.astype(jnp.float32) * scale + shift
                term = _silu_f32(pre)
                a = term if a is None else a + term
            a = a.astype(jnp.bfloat16)
        d = jnp.dot(a, w, preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = acc.astype(jnp.bfloat16)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)


# ---------------------------------------------------------------------------
# BN-stat glue (differentiable; jnp)
# ---------------------------------------------------------------------------

def stats_to_moments(s, ss, count):
    """(sum, sumsq, n) -> (mean, var). Differentiable."""
    mean = s / count
    var = jnp.maximum(ss / count - mean * mean, 0.0)
    return mean, var


def moments_to_affine(mean, var, gamma, beta, eps):
    """BN affine prefold: x_hat = x*scale + shift. Differentiable."""
    rs = jax.lax.rsqrt(var + eps)
    scale = gamma * rs
    shift = beta - mean * scale
    return scale, shift

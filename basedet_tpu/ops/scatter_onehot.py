"""Row-gather with a one-hot-matmul transpose (the DCN dF path).

The VJP of ``table[idx]`` is a scatter-add, which XLA serializes on TPU —
measured at the CenterNet DCN head stages it is the single largest cost of
the train step (playground/probe_dcn_split.py: backward-through-input is
6-7x the gather forward at every stage). For a *small* row table the
transpose has an MXU formulation:

    dTable = sum_chunks  onehot(idx_chunk)^T @ dV_chunk

i.e. a (R, CH) x (CH, D) matmul per chunk with f32 accumulation — no
scatter at all. FLOPs are 2*N*R*D, so the win shrinks as R (the table
height) grows. Standalone at the CenterNet DCN stage shapes (b8, bf16,
logs/probe_dcn_scatter_r4.log) the one-hot dF wins at all three stages —
R=441: 108.4→96.7 ms, R=1681: 48.1→43.9, R=6561: 110.6→84.6 (fwd+bwd wrt
input, 4-rep program) — but the in-train CenterNet A/B flips at the big
table: cutoff 2048 (R=441/1681 onehot, R=6561 xla) runs 86.9 img/s vs
79.6 with all three onehot and 77.9 all-xla (logs/bench_cnet_*_r4.log);
the stage-3 one-hot loses the fusion context it wins standalone (the
round-3 sub-pixel-dgrad lesson again), so the cutoff keeps it on the XLA
scatter. ``gather_rows_st`` picks per shape (override with
BASEDET_DCN_SCATTER=onehot|xla for A/Bs).

Semantics note: the one-hot path accumulates in f32 and casts once, while
the native scatter-add round-trips through the table dtype per addend —
for bf16 tables the one-hot result is the *more* accurate of the two.

Capability analogue of the scatter half of MegEngine's native
DeformableConv2d backward (/root/reference/basedet/layers/blocks/
deformable.py:9-66 wraps it); the forward gather stays native.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# in-train crossover, NOT the standalone one: R=6561 wins standalone but
# regresses the CenterNet step 86.9→79.6 img/s (see module doc; measured
# playground/probe_dcn_scatter.py + benchmark A/Bs, logs/*_r4.log)
_ONEHOT_MAX_ROWS = 2048
_CHUNK = 2048


def _maybe_bf16(g: jnp.ndarray) -> jnp.ndarray:
    """Optionally round f32 cotangents to bf16 before the one-hot matmul
    (BASEDET_DCN_BF16=1; the 0/1 one-hot operand is exact either way and
    the dot accumulates f32 via preferred_element_type).

    Default OFF — measured to be a no-op for the motivating case: under
    the AMP policy the CenterNet DCN cotangents arrive ALREADY bf16
    (probed dtypes at all three stage tables: bfloat16 — the round-5
    "dF matmul runs f32" hypothesis was false), so the in-train matmuls
    are bf16 x bf16 -> f32 with or without this. Kept as an experiment
    knob for f32 (non-AMP) callers only.
    """
    if g.dtype == jnp.float32 and os.environ.get(
        "BASEDET_DCN_BF16", "0"
    ) == "1":
        return g.astype(jnp.bfloat16)
    return g


def scatter_rows_onehot(idx: jnp.ndarray, values: jnp.ndarray,
                        n_rows: int) -> jnp.ndarray:
    """``zeros(n_rows, D).at[idx].add(values)`` as chunked one-hot matmuls.

    idx (N,) int32 (entries outside [0, n_rows) contribute nothing),
    values (N, D) → (n_rows, D) f32.
    """
    N, D = values.shape
    ch = min(_CHUNK, N)
    n_pad = -(-N // ch) * ch - N
    if n_pad:
        # pad index = n_rows: matches no output row, adds nothing
        idx = jnp.pad(idx, (0, n_pad), constant_values=n_rows)
        values = jnp.pad(values, ((0, n_pad), (0, 0)))
    rows = jax.lax.broadcasted_iota(jnp.int32, (ch, n_rows), 1)

    def body(acc, xs):
        f, g = xs  # (ch,), (ch, D)
        oh = (f[:, None] == rows).astype(g.dtype)
        return acc + jax.lax.dot_general(
            oh, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ), None

    acc0 = jnp.zeros((n_rows, D), jnp.float32)
    acc, _ = jax.lax.scan(
        body, acc0,
        (idx.reshape(-1, ch), values.reshape(-1, ch, values.shape[1])),
    )
    return acc


def _scatter_backend(n_rows: int) -> str:
    force = os.environ.get("BASEDET_DCN_SCATTER")
    if force in ("onehot", "xla", "pallas"):
        return force
    return "onehot" if n_rows <= _ONEHOT_MAX_ROWS else "xla"


# -- Pallas variant: one-hot built in VMEM, accumulator VMEM-resident --------
#
# The XLA scan above materializes each (chunk, R) one-hot tile in HBM before
# its dot (~27 MB/chunk at the 81x81 CenterNet table) and round-trips the
# (R, D) f32 accumulator through the scan carry. This kernel builds the
# one-hot tile in registers and revisits the output block across the
# N-chunk grid axis, so HBM traffic is one read of idx+values and one write
# of the result.


def _scatter_oh_kernel(idx_ref, v_ref, out_ref, *, rb):
    r = pl.program_id(1)
    n = pl.program_id(3)
    ch = idx_ref.shape[2]

    @pl.when(n == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (ch, rb), 1) + r * rb
    oh = (idx_ref[0, 0] == rows).astype(v_ref.dtype)  # (CH, 1)==(CH, RB)
    out_ref[0] += jax.lax.dot_general(
        oh, v_ref[0, 0],  # (CH, RB), (CH, DT) — contract CH
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def scatter_rows_onehot_pallas(idx: jnp.ndarray, values: jnp.ndarray,
                               n_rows: int,
                               interpret: bool = False) -> jnp.ndarray:
    """Batched ``zeros(R, D).at[idx].add(values)`` as a Pallas kernel.

    idx (B, N) int32 (entries outside [0, n_rows) contribute nothing),
    values (B, N, D) → (B, n_rows, D) f32. Requires D % 128 == 0.
    """
    B, N, D = values.shape
    assert D % 128 == 0, D
    RB = min(512, -(-n_rows // 8) * 8)
    RP = -(-n_rows // RB) * RB
    DT = min(2048, D)
    # the channel grid uses floor division — pad D up to a DT multiple so
    # trailing channels (e.g. D = 2176 with DT = 2048) are never dropped
    DP = -(-D // DT) * DT
    if DP != D:
        values = jnp.pad(values, ((0, 0), (0, 0), (0, DP - D)))
    CH = min(512, -(-N // 8) * 8)
    NP = -(-N // CH) * CH
    if NP != N:
        # pad idx with RP: beyond every row block -> matches nothing
        idx = jnp.pad(idx, ((0, 0), (0, NP - N)), constant_values=RP)
        values = jnp.pad(values, ((0, 0), (0, NP - N), (0, 0)))
    idx4 = idx.reshape(B, NP // CH, CH, 1)
    v3 = values.reshape(B, NP // CH, CH, DP)

    out = pl.pallas_call(
        functools.partial(_scatter_oh_kernel, rb=RB),
        grid=(B, RP // RB, DP // DT, NP // CH),
        in_specs=[
            pl.BlockSpec((1, 1, CH, 1), lambda b, r, d, n: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, CH, DT), lambda b, r, d, n: (b, n, 0, d)),
        ],
        out_specs=pl.BlockSpec(
            (1, RB, DT), lambda b, r, d, n: (b, r, d)
        ),
        out_shape=jax.ShapeDtypeStruct((B, RP, DP), jnp.float32),
        interpret=interpret,
    )(idx4, v3)
    return out[:, :n_rows, :D]


@functools.lru_cache(maxsize=None)
def _gather_rows_fn(n_rows: int):
    # the table height must be static in the bwd rule (it sizes dTable and
    # picks the scatter strategy) — cache one custom_vjp per height
    @jax.custom_vjp
    def f(table, idx):
        return table[idx]

    def fwd(table, idx):
        # zero-size proto carries the table dtype through the residuals
        return table[idx], (idx, jnp.zeros((0,), table.dtype))

    def bwd(res, g):
        idx, proto = res
        if _scatter_backend(n_rows) == "onehot":
            dtable = scatter_rows_onehot(
                idx, _maybe_bf16(g), n_rows
            ).astype(proto.dtype)
        else:
            dtable = (
                jnp.zeros((n_rows, g.shape[-1]), proto.dtype).at[idx].add(g)
            )
        return dtable, np.zeros(idx.shape, jax.dtypes.float0)

    f.defvjp(fwd, bwd)
    return f


def gather_rows_st(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` — table (R, D), idx (N,) int32 in-range → (N, D).

    Forward is the native gather; backward routes dTable through the
    one-hot matmul transpose when the table is small (see module doc)."""
    return _gather_rows_fn(table.shape[0])(table, idx)


@functools.lru_cache(maxsize=None)
def _gather_rows_batched_fn(n_rows: int):
    @jax.custom_vjp
    def f(table, idx):  # (B, R, D), (B, N) -> (B, N, D)
        return jnp.take_along_axis(table, idx[..., None], axis=1)

    def fwd(table, idx):
        return f(table, idx), (idx, jnp.zeros((0,), table.dtype))

    def bwd(res, g):
        idx, proto = res
        backend = _scatter_backend(n_rows)
        if backend == "pallas" and g.shape[-1] % 128 == 0:
            dtable = scatter_rows_onehot_pallas(
                idx, _maybe_bf16(g), n_rows,
                interpret=jax.default_backend() != "tpu",
            )
        elif backend in ("onehot", "pallas"):
            dtable = jax.vmap(
                lambda i, v: scatter_rows_onehot(i, v, n_rows)
            )(idx, _maybe_bf16(g))
        else:
            # native scatter-add in table dtype (identical numerics to the
            # unbatched xla branch above)
            dtable = jax.vmap(
                lambda i, v: jnp.zeros(
                    (n_rows, v.shape[-1]), proto.dtype
                ).at[i].add(v)
            )(idx, g.astype(proto.dtype))
        return dtable.astype(proto.dtype), np.zeros(
            idx.shape, jax.dtypes.float0
        )

    f.defvjp(fwd, bwd)
    return f


def gather_rows_batched(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched ``table[b, idx[b]]`` — table (B, R, D), idx (B, N) int32
    in-range → (B, N, D). Same backend routing as :func:`gather_rows_st`,
    plus the Pallas scatter (BASEDET_DCN_SCATTER=pallas) which needs the
    explicit batch dim (no vmap-of-pallas)."""
    return _gather_rows_batched_fn(table.shape[1])(table, idx)

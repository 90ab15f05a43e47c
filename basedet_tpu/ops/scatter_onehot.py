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

# in-train crossover, NOT the standalone one: R=6561 wins standalone but
# regresses the CenterNet step 86.9→79.6 img/s (see module doc; measured
# playground/probe_dcn_scatter.py + benchmark A/Bs, logs/*_r4.log)
_ONEHOT_MAX_ROWS = 2048
_CHUNK = 2048


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
    if force in ("onehot", "xla"):
        return force
    return "onehot" if n_rows <= _ONEHOT_MAX_ROWS else "xla"


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
            dtable = scatter_rows_onehot(idx, g, n_rows).astype(proto.dtype)
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

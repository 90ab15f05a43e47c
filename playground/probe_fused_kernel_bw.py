"""Where do the fused-BN kernel's bytes/s go? (v5e, dark2-packed shapes)

probe_fused_micro.py: XLA dot+stats ~668 GB/s real; fused kernel ~240.
Variants here, same x (819200,256) bf16 @ w (256,128):

  pure gemm        Pallas dot only, no stats, no epilogue
  gemm+round       dot -> bf16 write (the f32->bf16 round only)
  gemm+stats       production kernel (round + s/ss accumulate)
  gemm+stats-f32   stats on the f32 acc (pre-rounding, no extra astype)
  2-out gemm       one call computing TWO gemms from one x read
                   (conv1+conv2 fusion candidate: halves x traffic)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from basedet_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

M, K, N = 819200, 256, 128
REPS, N_TIMED = 8, 5
TM = 2048


def timed(tag, prog, *args, bytes_per_rep):
    float(np.asarray(prog(*args)))
    t0 = time.perf_counter()
    outs = [prog(*args) for _ in range(N_TIMED)]
    float(np.asarray(outs[-1]))
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    print(f"{tag:18s} {dt:8.3f} ms   {bytes_per_rep/2**30/(dt/1e3):7.1f} GB/s",
          flush=True)
    return dt


rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(M, K) * 0.1, jnp.bfloat16)
w = jnp.asarray(rng.randn(K, N) / np.sqrt(K), jnp.bfloat16)
w2 = jnp.asarray(rng.randn(K, N) / np.sqrt(K), jnp.bfloat16)

x_spec = pl.BlockSpec((TM, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
w_spec = pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM)
y_spec = pl.BlockSpec((TM, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
s_spec = pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM)


def k_pure(x_ref, w_ref, y_ref):
    y_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                         preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def k_stats(x_ref, w_ref, y_ref, s_ref, ss_ref, *, on_f32):
    acc = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    y16 = acc.astype(jnp.bfloat16)
    y_ref[...] = y16
    yf = acc if on_f32 else y16.astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[...] = jnp.zeros(s_ref.shape, s_ref.dtype)
        ss_ref[...] = jnp.zeros(ss_ref.shape, ss_ref.dtype)

    s_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
    ss_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


def k_2out(x_ref, w_ref, w2_ref, y_ref, y2_ref):
    xv = x_ref[...]
    y_ref[...] = jnp.dot(xv, w_ref[...],
                         preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    y2_ref[...] = jnp.dot(xv, w2_ref[...],
                          preferred_element_type=jnp.float32).astype(jnp.bfloat16)


grid = (M // TM,)


def run_pure(x, w):
    return pl.pallas_call(
        k_pure, grid=grid, in_specs=[x_spec, w_spec], out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16))(x, w)


def run_stats(x, w, on_f32):
    return pl.pallas_call(
        functools.partial(k_stats, on_f32=on_f32), grid=grid,
        in_specs=[x_spec, w_spec], out_specs=(y_spec, s_spec, s_spec),
        out_shape=(jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                   jax.ShapeDtypeStruct((1, N), jnp.float32),
                   jax.ShapeDtypeStruct((1, N), jnp.float32)))(x, w)


def run_2out(x, w, w2):
    return pl.pallas_call(
        k_2out, grid=grid, in_specs=[x_spec, w_spec, w_spec],
        out_specs=(y_spec, y_spec),
        out_shape=(jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                   jax.ShapeDtypeStruct((M, N), jnp.bfloat16)))(x, w, w2)


def rep8(fn):
    @jax.jit
    def prog(*args):
        acc = jnp.float32(0)
        for r in range(REPS):
            a0 = (args[0] + jnp.bfloat16(r),) + args[1:]
            out = fn(*a0)
            leaves = jax.tree_util.tree_leaves(out)
            acc += sum(l.astype(jnp.float32).sum() for l in leaves)
        return acc
    return prog


if __name__ == "__main__":
    print("device:", jax.devices()[0], f"TM={TM}")
    base = (M * K + M * N) * 2
    timed("pure gemm", rep8(run_pure), x, w, bytes_per_rep=base)
    timed("gemm+stats", rep8(lambda x, w: run_stats(x, w, False)), x, w,
          bytes_per_rep=base)
    timed("gemm+stats-f32", rep8(lambda x, w: run_stats(x, w, True)), x, w,
          bytes_per_rep=base)
    timed("2-out gemm", rep8(run_2out), x, w, w2,
          bytes_per_rep=(M * K + 2 * M * N) * 2)

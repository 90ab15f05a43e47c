"""Does Mosaic lower a VMEM-resident row gather? (DCN kernel feasibility)

Variants:
  A: jnp fancy-index table[idx] inside the kernel
  B: jnp.take(table, idx, axis=0)
  C: jax.lax.gather via take_along_axis on a broadcast index
Each compiled on the real TPU with tiny shapes; prints OK/FAIL per variant.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, M, C = 512, 256, 128


def kern_a(idx_ref, t_ref, o_ref):
    o_ref[:] = t_ref[:][idx_ref[:, 0], :]


def kern_b(idx_ref, t_ref, o_ref):
    o_ref[:] = jnp.take(t_ref[:], idx_ref[:, 0], axis=0)


def kern_c(idx_ref, t_ref, o_ref):
    idx2 = jax.lax.broadcast_in_dim(idx_ref[:, 0], (M, C), (0,))
    o_ref[:] = jnp.take_along_axis(t_ref[:], idx2, axis=0)


def run(name, kern):
    t = jnp.asarray(np.random.RandomState(0).randn(N, C), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, N, M), jnp.int32)

    try:
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((M, 1), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((N, C), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((M, C), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
        )(idx[:, None], t)
        ref = np.asarray(t)[np.asarray(idx)]
        ok = np.allclose(np.asarray(out), ref)
        print(f"{name}: compiled, correct={ok}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


def kern_d(idx_ref, t_ref, o_ref):
    idx2 = jax.lax.broadcast_in_dim(idx_ref[:, 0], (N, C), (0,))
    o_ref[:] = jnp.take_along_axis(t_ref[:], idx2, axis=0)


def run_d():
    t = jnp.asarray(np.random.RandomState(0).randn(N, C), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, N, N), jnp.int32)
    try:
        out = pl.pallas_call(
            kern_d,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((N, 1), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((N, C), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((N, C), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        )(idx[:, None], t)
        ref = np.asarray(t)[np.asarray(idx)]
        ok = np.allclose(np.asarray(out), ref)
        print(f"D same-shape take_along_axis: compiled, correct={ok}", flush=True)
    except Exception as e:
        print(f"D same-shape: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    run_d()

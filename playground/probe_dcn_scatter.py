"""A/B the one-hot-matmul dF (ops/scatter_onehot.py) vs the XLA scatter-add
at the three CenterNet DCN stage shapes (b8 640 bf16), fwd+bwd wrt input —
the split probe showed backward-through-input is 6-7x the gather forward.
Also checks compiled onehot==scatter equality on hardware per stage.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.layers.precision import precision_policy

B, REPS, N_TIMED = 8, 4, 5


def timed(name, prog, *args):
    float(np.asarray(jax.tree_util.tree_leaves(prog(*args))[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    outs = [prog(*args) for _ in range(N_TIMED)]
    float(np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    with precision_policy(jnp.bfloat16):
        from basedet_tpu.layers.blocks.deformable import ModulatedDeformConv

        for cin, cout, hw in ((2048, 256, 20), (256, 128, 40), (128, 64, 80)):
            n_rows = (hw + 1) * (hw + 1)
            fs = [
                jnp.asarray(rng.rand(B, hw, hw, cin).astype(np.float32),
                            dtype=jnp.bfloat16)
                for _ in range(REPS)
            ]
            dcn = ModulatedDeformConv(cout)
            dv = dcn.init(jax.random.PRNGKey(0), fs[0])
            # non-trivial offsets: perturb conv_offset bias so samples leave
            # the regular grid (zero-init offsets give unrealistically
            # coherent scatter indices)
            dv = jax.tree_util.tree_map(
                lambda a: a + 0.5 if a.ndim == 1 and a.shape[0] == 27 else a,
                dv,
            )

            def loss(v, fs):
                acc = jnp.float32(0)
                for f in fs:
                    acc += jnp.sum(dcn.apply(v, f).astype(jnp.float32))
                return acc

            grads = {}
            for backend in ("xla", "onehot", "pallas"):
                os.environ["BASEDET_DCN_SCATTER"] = backend
                # new jit per backend: the env gate is read at trace time
                prog = jax.jit(jax.grad(loss, argnums=1))
                grads[backend] = prog(dv, fs)[0]
                timed(
                    f"DCN {cin}->{cout}@{hw} R={n_rows} dF[{backend}]",
                    prog, dv, fs,
                )
            for other in ("onehot", "pallas"):
                err = float(jnp.max(jnp.abs(
                    grads["xla"].astype(jnp.float32)
                    - grads[other].astype(jnp.float32)
                )))
                rel = err / (float(jnp.std(
                    grads["xla"].astype(jnp.float32))) + 1e-12)
                print(f"  dF {other} vs xla max_abs={err:.5f} "
                      f"abs/std={rel:.2e}", flush=True)
    os.environ.pop("BASEDET_DCN_SCATTER", None)


if __name__ == "__main__":
    main()

"""Split each CenterNet DCN stage into fwd / fwd+bwd / bwd-parts to find
whether the bilinear GATHER (fwd) or its SCATTER-ADD transpose (bwd dF)
is the sink — scatter serializes on TPU, gather scales with row count.
Stages at b8 (head shapes of the 640 CenterNet step).
"""
from __future__ import annotations

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
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    with precision_policy(jnp.bfloat16):
        from basedet_tpu.layers.blocks.deformable import (
            ModulatedDeformConv, _bilinear_sample,
        )

        for cin, cout, hw in ((2048, 256, 20), (256, 128, 40), (128, 64, 80)):
            f = jnp.asarray(rng.rand(B, hw, hw, cin).astype(np.float32),
                            dtype=jnp.bfloat16)
            dcn = ModulatedDeformConv(cout)
            dv = dcn.init(jax.random.PRNGKey(0), f)

            def loss(v, f):
                acc = jnp.float32(0)
                for k in range(REPS):
                    acc += jnp.sum(
                        dcn.apply(v, f + jnp.bfloat16(k)).astype(jnp.float32)
                    )
                return acc

            timed(f"DCN {cin}->{cout}@{hw} fwd", jax.jit(loss), dv, f)
            timed(f"DCN {cin}->{cout}@{hw} fwd+bwd (wrt params)",
                  jax.jit(jax.grad(loss, argnums=0)), dv, f)
            timed(f"DCN {cin}->{cout}@{hw} fwd+bwd (wrt input)",
                  jax.jit(jax.grad(loss, argnums=1)), dv, f)

            # isolate the gather itself: sample at fixed random coords
            K = 9
            ys = jnp.asarray(
                rng.uniform(-1, hw, (B, hw, hw, K)).astype(np.float32)
            )
            xs = jnp.asarray(
                rng.uniform(-1, hw, (B, hw, hw, K)).astype(np.float32)
            )

            def samp_loss(f, ys, xs):
                acc = jnp.float32(0)
                for k in range(REPS):
                    s = jax.vmap(_bilinear_sample)(f + jnp.bfloat16(k), ys, xs)
                    acc += jnp.sum(s.astype(jnp.float32))
                return acc

            timed(f"gather {cin}@{hw} fwd", jax.jit(samp_loss), f, ys, xs)
            timed(f"gather {cin}@{hw} fwd+scatterbwd",
                  jax.jit(jax.grad(samp_loss, argnums=0)), f, ys, xs)


if __name__ == "__main__":
    main()

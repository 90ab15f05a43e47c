"""Is the fused RoIAlign kernel per-grid-step-overhead bound?

Times the P2-level fwd pallas call (the dominant level) at several roi
counts R (grid = B * C/CT * R/G steps) plus an all-masks-zero variant
(kernel body = just the zero store). If time ~ step count regardless of
mask activity, per-step overhead dominates and the fix is fewer, fatter
grid steps (in-kernel roi-group loop), not faster dots.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.ops import roi_align_pallas as rap

B, H, W, C = 8, 160, 160, 256
REPS, N_TIMED = 8, 5


def timed(name, prog, *args):
    s = float(np.asarray(prog(*args)))
    t0 = time.perf_counter()
    outs = [prog(*args) for _ in range(N_TIMED)]
    s = float(np.asarray(outs[-1]))
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    print(f"{name:44s} {dt:8.3f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32),
                    dtype=jnp.bfloat16)

    for R in (64, 256, 512):
        ph = pw = 7
        py = jnp.asarray(
            np.abs(rng.rand(B, R, ph, H)).astype(np.float32),
            dtype=jnp.bfloat16) * 0.01
        px = jnp.asarray(
            np.abs(rng.rand(B, R, pw, W)).astype(np.float32),
            dtype=jnp.bfloat16) * 0.01
        nrg = R // rap._G
        for mname, mask in (
            ("all-active", jnp.ones((B, nrg), jnp.int32)),
            ("all-skip", jnp.zeros((B, nrg), jnp.int32)),
        ):
            @jax.jit
            def prog(f, py, px, mask):
                acc = jnp.float32(0)
                for k in range(REPS):
                    o = rap._level_call_fwd(
                        f + jnp.bfloat16(k), py, px, mask, False)
                    acc += o.astype(jnp.float32).sum()
                return acc

            steps = B * (C // 128) * nrg
            timed(f"fwd R={R} {mname} ({steps} steps)", prog, f, py, px, mask)


if __name__ == "__main__":
    main()

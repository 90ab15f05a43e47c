"""Does XLA:TPU pad narrow trailing dims to 128 lanes in HBM?

If a (B,H,W,64) bf16 activation physically occupies (B,H,W,128) — lane
padding — then every dark2/dark3 CSP tensor pays 2x HBM bytes, which
would explain part of the 16-19 TF/s observed there and argues for
packed layouts in the fused-BN kernel chain (round-4 project).

Method: (1) live_buffers/memory_stats delta for device_put of shapes with
C in {32, 64, 128, 512}; (2) timed on-device copy (y = x + 1) per shape —
BW-bound, so ms ratio == physical-bytes ratio.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
print("device:", dev)

M = 128 * 160 * 160  # dark2 spatial elements


def footprint(shape, dtype=jnp.bfloat16):
    base = dev.memory_stats()["bytes_in_use"] if dev.memory_stats() else None
    x = jax.device_put(jnp.zeros(shape, dtype), dev)
    x.block_until_ready()
    if base is None:
        return x, None
    used = dev.memory_stats()["bytes_in_use"] - base
    return x, used


def timed_copy(x, reps=16, n=3):
    @jax.jit
    def prog(x):
        acc = x
        for _ in range(reps):
            acc = acc + jnp.bfloat16(1)
        return acc

    r = prog(x)
    np.asarray(jax.device_get(r[0, :1]))
    t0 = time.perf_counter()
    outs = [prog(x) for _ in range(n)]
    np.asarray(jax.device_get(outs[-1][0, :1]))
    return (time.perf_counter() - t0) / n / reps * 1e3


for C in (32, 64, 128, 512):
    shape = (M // C * C // 160 // 160, 160, 160, C) if False else (M // C, C)
    x, used = footprint(shape)
    logical = int(np.prod(shape)) * 2
    ms = timed_copy(x)
    print(
        f"shape {str(shape):>18} logical {logical/2**20:8.1f} MiB  "
        f"reported {'-' if used is None else f'{used/2**20:8.1f} MiB'}  "
        f"copy {ms:7.3f} ms  ({logical/2**30/(ms/1e3)*2:6.1f} GB/s eff r+w)"
    )
    del x

# NHWC 4-D versions (conv-style shapes)
for C in (32, 64, 128):
    shape = (128, 160, 160, C)
    x, used = footprint(shape)
    logical = int(np.prod(shape)) * 2
    ms = timed_copy(x)
    print(
        f"shape {str(shape):>18} logical {logical/2**20:8.1f} MiB  "
        f"reported {'-' if used is None else f'{used/2**20:8.1f} MiB'}  "
        f"copy {ms:7.3f} ms  ({logical/2**30/(ms/1e3)*2:6.1f} GB/s eff r+w)"
    )
    del x

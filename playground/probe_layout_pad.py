"""Does XLA:TPU pad narrow trailing dims (C=32/64) to 128 lanes in HBM?

Answer (v5e, 2026-08-19): NO — ``compiled.memory_analysis()`` reports
physical argument/output sizes EQUAL to logical bytes for every probed
shape, including (M, 32), (M, 64) 2-D and (128,160,160,{32,64,128}) NHWC:

    (51200, 64)            logical   6 MiB   arg   6 MiB
    (25600, 128)           logical   6 MiB   arg   6 MiB
    (128, 160, 160, 32)    logical 200 MiB   arg 200 MiB
    (128, 160, 160, 64)    logical 400 MiB   arg 400 MiB
    (128, 160, 160, 128)   logical 800 MiB   arg 800 MiB
    (3276800, 32)          logical 200 MiB   arg 200 MiB
    (1638400, 64)          logical 200 MiB   arg 200 MiB

So the dark2/dark3 CSP tensors pay no hidden 2x lane-padding tax, and the
fused-BN raw-chain traffic math (ops/fused_bn.py docstring) holds as
computed on logical bytes.

Note: a first attempt timed an on-device add chain instead — useless here:
XLA constant-folds the chain to one pass and the axon tunnel adds ~3 ms
per dispatch, so small-copy timings are RTT-dominated (round-2 lesson).
"""
import jax
import jax.numpy as jnp
import numpy as np

if __name__ == "__main__":
    print("device:", jax.devices()[0])
    for shape in [
        (51200, 64), (25600, 128),
        (128, 160, 160, 32), (128, 160, 160, 64), (128, 160, 160, 128),
        (3276800, 32), (1638400, 64),
    ]:
        f = jax.jit(lambda x: x + jnp.bfloat16(1))
        c = f.lower(jax.ShapeDtypeStruct(shape, jnp.bfloat16)).compile()
        ma = c.memory_analysis()
        logical = int(np.prod(shape)) * 2
        print(
            f"{str(shape):>22} logical {logical >> 20:5d} MiB  "
            f"arg {ma.argument_size_in_bytes >> 20:5d} MiB  "
            f"out {ma.output_size_in_bytes >> 20:5d} MiB"
        )

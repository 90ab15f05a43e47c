"""YOLOX-S per-stage fwd vs fwd+bwd at b128 640 bf16 (queued timing).

Locates the extra ~1x-fwd of backward cost (bwd/fwd 3.2x measured vs the
theoretical ~2x). Methodology: REPS convs inside ONE jitted program,
N_TIMED queued calls, single scalar-readback fence (per-call fences pay the
~30 ms axon round-trip; see docs/ROADMAP.md round-2 notes).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.layers.precision import precision_policy

B, REPS, N_TIMED = 128, 8, 5


def timed(name, gflop, prog, *args):
    s = float(np.asarray(prog(*args)))
    t0 = time.perf_counter()
    outs = [prog(*args) for _ in range(N_TIMED)]
    s = float(np.asarray(outs[-1]))
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    tfs = gflop / dt if gflop else 0.0
    print(f"{name:36s} {dt:8.2f} ms  {tfs:6.1f} TF/s", flush=True)


def stage(name, mod, shape, gflop_fwd):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*shape).astype(np.float32), jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x)

    def apply(v, x):
        out = mod.apply(v, x, mutable=["batch_stats"])[0]
        if isinstance(out, dict):
            out = sum(z.astype(jnp.float32).sum() for z in out.values())
        else:
            out = out.astype(jnp.float32).sum()
        return out

    @jax.jit
    def fwd(v, x):
        acc = jnp.float32(0)
        for r in range(REPS):
            acc += apply(v, x + jnp.bfloat16(r))
        return acc

    @jax.jit
    def fwdbwd(v, x):
        def loss(v):
            acc = jnp.float32(0)
            for r in range(REPS):
                acc += apply(v, x + jnp.bfloat16(r))
            return acc
        l, g = jax.value_and_grad(loss)(v)
        return l + jax.tree_util.tree_reduce(
            lambda a, b: a + b.astype(jnp.float32).sum(), g, jnp.float32(0))

    timed(f"{name} fwd", gflop_fwd, fwd, v, x)
    timed(f"{name} f+b", gflop_fwd * 3, fwdbwd, v, x)


def main():
    with precision_policy(jnp.bfloat16):
        from basedet_tpu.layers.blocks.yolo_block import (
            CSPLayer, Focus, _ConvBNAct,
        )

        w, d = 0.5, 0.33  # YOLOX-S
        base_c = int(64 * w)  # 32

        # stem Focus -> 32ch @320
        stage("stem Focus 3->32 @640->320",
              Focus(base_c, 3, train=True), (B, 640, 640, 3),
              2 * B * 320 * 320 * 12 * 32 * 36 / 1e9)

        # dark2: down conv 32->64 @320->160 + CSP(64, n=1)
        stage("dark2 down 32->64 @320->160",
              _ConvBNAct(64, 3, 2, train=True), (B, 320, 320, 32),
              2 * B * 160 * 160 * 32 * 64 * 9 / 1e9)
        stage("dark2 CSP64 n1 @160",
              CSPLayer(64, n=1, train=True), (B, 160, 160, 64),
              2 * B * 160 * 160 * (64 * 64 * 2 + 32 * 32 * 9 + 32 * 32) / 1e9)

        stage("dark3 down 64->128 @160->80",
              _ConvBNAct(128, 3, 2, train=True), (B, 160, 160, 64),
              2 * B * 80 * 80 * 64 * 128 * 9 / 1e9)
        stage("dark3 CSP128 n3 @80",
              CSPLayer(128, n=3, train=True), (B, 80, 80, 128),
              2 * B * 80 * 80 * (128 * 128 * 2 + 3 * (64 * 64 * 10)) / 1e9)

        stage("dark4 down 128->256 @80->40",
              _ConvBNAct(256, 3, 2, train=True), (B, 80, 80, 128),
              2 * B * 40 * 40 * 128 * 256 * 9 / 1e9)
        stage("dark4 CSP256 n3 @40",
              CSPLayer(256, n=3, train=True), (B, 40, 40, 256),
              2 * B * 40 * 40 * (256 * 256 * 2 + 3 * (128 * 128 * 10)) / 1e9)

        stage("dark5 down 256->512 @40->20",
              _ConvBNAct(512, 3, 2, train=True), (B, 40, 40, 256),
              2 * B * 20 * 20 * 256 * 512 * 9 / 1e9)


if __name__ == "__main__":
    main()

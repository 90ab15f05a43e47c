"""A/B: fused-BN Pallas chain vs XLA flax CSP at dark2/dark3 shapes (b128).

Round-3 diagnosis: dark2/dark3 CSP are HBM-BW-bound on train-BN round
trips. ops/fused_bn.py restructures each 1x1 conv as a Pallas GEMM with
stats fused in the epilogue and normalize+SiLU fused in the consumer's
prologue (raw tensors cross HBM twice instead of ~5x). The 3x3 bottleneck
conv stays XLA in this cut (its input act is materialized by one fused
elementwise pass; its output stats are one fused reduce).

Prints fwd and f+b ms for: xla (flax MiniCSP, train BN), fused.
Queued-dispatch single-fence timing (round-2 RTT lesson). REPS distinct
inputs are materialized at setup: a per-rep `x + r` inside the jit is
fused by XLA but must materialize before a pallas_call, which polluted
the first version's numbers by an extra x-sized HBM round trip per rep.
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

sys.path.insert(0, "/root/repo")
from basedet_tpu.layers.blocks.csp_fused import csp_layer_fused  # noqa: E402
from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B, REPS, N_TIMED = 128, 8, 5
EPS, MOM = 1e-3, 0.97


# ---- XLA baseline: the production CSP block shape (train-mode BN) ----------
class MiniConv(nn.Module):
    co: int
    k: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.k - 1) // 2
        x = nn.Conv(self.co, (self.k, self.k), (1, 1), padding=pad,
                    use_bias=False, dtype=jnp.bfloat16, name="conv")(x)
        x = nn.BatchNorm(use_running_average=False, momentum=MOM,
                         epsilon=EPS, dtype=jnp.bfloat16)(x)
        return nn.silu(x)


class MiniCSP(nn.Module):
    co: int
    n: int = 1

    @nn.compact
    def __call__(self, x):
        h = self.co // 2
        x1 = MiniConv(h, 1, name="conv1")(x)
        x2 = MiniConv(h, 1, name="conv2")(x)
        for i in range(self.n):
            y = MiniConv(h, 1, name=f"m{i}a")(x1)
            y = MiniConv(h, 3, name=f"m{i}b")(y)
            x1 = x1 + y
        x = jnp.concatenate([x1, x2], axis=-1)
        return MiniConv(self.co, 1, name="conv3")(x)


# ---- fused chain ------------------------------------------------------------
def init_fused_params(rng, C, n):
    h = C // 2
    p = {}

    def conv(key, ci, co, k=1):
        p[key + "/w"] = jnp.asarray(
            rng.randn(k, k, ci, co) * (1.0 / np.sqrt(k * k * ci)),
            jnp.bfloat16,
        )
        p[key + "/g"] = jnp.ones((co,), jnp.float32)
        p[key + "/b"] = jnp.zeros((co,), jnp.float32)

    conv("conv1", C, h)
    conv("conv2", C, h)
    for i in range(n):
        conv(f"m{i}a", h, h)
        conv(f"m{i}b", h, h, k=3)
    conv("conv3", C, C)
    return p


# ---- timing harness ---------------------------------------------------------
def timed(tag, prog, *args):
    float(np.asarray(prog(*args)))  # compile + fence
    t0 = time.perf_counter()
    outs = [prog(*args) for _ in range(N_TIMED)]
    float(np.asarray(outs[-1]))
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    print(f"{tag:34s} {dt:8.3f} ms", flush=True)
    return dt


def run(name, H, C, n):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    xs = tuple(x + jnp.bfloat16(0.25 * i) for i in range(REPS))
    float(np.asarray(xs[-1][0, 0, 0, 0]))  # materialize before timing

    # --- XLA baseline
    mod = MiniCSP(C, n=n)
    v = mod.init(jax.random.PRNGKey(0), x)

    def apply_xla(v, x):
        out = mod.apply(v, x, mutable=["batch_stats"])[0]
        return out.astype(jnp.float32).sum()

    @jax.jit
    def fwd_xla(v, xs):
        acc = jnp.float32(0)
        for xr in xs:
            acc += apply_xla(v, xr)
        return acc

    @jax.jit
    def fb_xla(v, xs):
        def loss(v):
            acc = jnp.float32(0)
            for xr in xs:
                acc += apply_xla(v, xr)
            return acc
        l, g = jax.value_and_grad(loss)(v)
        return l + jax.tree_util.tree_reduce(
            lambda a, b: a + b.astype(jnp.float32).sum(), g["params"], 0.0
        )

    # --- fused
    p = init_fused_params(rng, C, n)

    def apply_fused(p, x):
        out, _ = csp_layer_fused(p, x, n)
        return out.astype(jnp.float32).sum()

    @jax.jit
    def fwd_fused(p, xs):
        acc = jnp.float32(0)
        for xr in xs:
            acc += apply_fused(p, xr)
        return acc

    @jax.jit
    def fb_fused(p, xs):
        def loss(p):
            acc = jnp.float32(0)
            for xr in xs:
                acc += apply_fused(p, xr)
            return acc
        l, g = jax.value_and_grad(loss)(p)
        return l + jax.tree_util.tree_reduce(
            lambda a, b: a + b.astype(jnp.float32).sum(), g, 0.0
        )

    print(f"== {name} (B={B}, {H}x{H}x{C}, n={n})")
    t1 = timed("fwd xla", fwd_xla, v, xs)
    t2 = timed("fwd fused", fwd_fused, p, xs)
    t3 = timed("f+b xla", fb_xla, v, xs)
    t4 = timed("f+b fused", fb_fused, p, xs)
    print(f"   fwd speedup {t1 / t2:5.2f}x   f+b speedup {t3 / t4:5.2f}x",
          flush=True)


if __name__ == "__main__":
    run("dark2", 160, 64, 1)
    run("dark3", 80, 128, 3)
    run("dark4", 40, 256, 3)

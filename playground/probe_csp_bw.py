"""Where does dark2/dark3 CSP time go? (HBM-traffic decomposition)

probe_packed_s1 proved the CSP 3x3 convs alone hit 54-74 TF/s while the
whole CSP64 block runs at 16-19 TF/s -> the block is bandwidth/structure
bound, not MXU bound. This probe prices each structural element by
ablation at the production shapes (b128):

  full      - CSPLayer as in production (train-mode BN + SiLU)
  evalbn    - BN in eval mode (no batch-stat reductions)
  nobn      - convs + SiLU only
  noact     - convs + train BN, no SiLU
  convs     - convs only
  nocat     - full but the concat replaced by x1 + x2 (prices the concat)

fwd and f+b each. The full-vs-evalbn delta is the stats passes; evalbn-vs-
nobn is the normalize arithmetic (should fuse ~free); full-vs-nocat the
concat materialization.
"""
import time
from functools import partial

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B, REPS, N_TIMED = 128, 8, 5


class MiniConv(nn.Module):
    co: int
    k: int = 1
    mode: str = "full"  # full | evalbn | nobn | noact | convs
    train: bool = True

    @nn.compact
    def __call__(self, x):
        pad = (self.k - 1) // 2
        x = nn.Conv(self.co, (self.k, self.k), (1, 1), padding=pad,
                    use_bias=self.mode in ("nobn",), dtype=jnp.bfloat16,
                    name="conv")(x)
        if self.mode in ("full", "evalbn", "noact"):
            x = nn.BatchNorm(
                use_running_average=(self.mode == "evalbn") or not self.train,
                momentum=0.97, epsilon=1e-3, dtype=jnp.bfloat16)(x)
        if self.mode in ("full", "evalbn", "nobn"):
            x = nn.silu(x)
        return x


class MiniCSP(nn.Module):
    co: int
    n: int = 1
    mode: str = "full"
    cat: bool = True

    @nn.compact
    def __call__(self, x):
        h = self.co // 2
        m = self.mode
        x1 = MiniConv(h, 1, m, name="conv1")(x)
        x2 = MiniConv(h, 1, m, name="conv2")(x)
        for i in range(self.n):
            y = MiniConv(h, 1, m, name=f"m{i}a")(x1)
            y = MiniConv(h, 3, m, name=f"m{i}b")(y)
            x1 = x1 + y
        x = jnp.concatenate([x1, x2], axis=-1) if self.cat else x1 + x2
        if not self.cat:
            x = jnp.concatenate([x, x], axis=-1)  # keep channel count
        return MiniConv(self.co, 1, m, name="conv3")(x)


def timed(tag, prog, *args):
    float(np.asarray(prog(*args)))
    t0 = time.perf_counter()
    outs = [prog(*args) for _ in range(N_TIMED)]
    float(np.asarray(outs[-1]))
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    print(f"{tag:32s} {dt:8.3f} ms", flush=True)


def run(name, H, C, n):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32) * .1,
                    jnp.bfloat16)
    for mode, cat in (("full", True), ("evalbn", True), ("nobn", True),
                      ("noact", True), ("convs", True), ("full", False)):
        tag = mode if cat else "nocat"
        mod = MiniCSP(C, n=n, mode=mode if mode != "convs" else "noactbn",
                      cat=cat)
        # 'convs' = neither bn nor act
        if mode == "convs":
            mod = MiniCSP(C, n=n, mode="convs", cat=cat)
        v = mod.init(jax.random.PRNGKey(0), x)

        def apply(v, x, mod=mod):
            out = mod.apply(v, x, mutable=["batch_stats"])[0]
            return out.astype(jnp.float32).sum()

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
                lambda a, b: a + b.astype(jnp.float32).sum(), g,
                jnp.float32(0))

        timed(f"{name} fwd {tag}", fwd, v, x)
        timed(f"{name} f+b {tag}", fwdbwd, v, x)


if __name__ == "__main__":
    run("CSP64 n1 @160", 160, 64, 1)
    run("CSP128 n3 @80", 80, 128, 3)

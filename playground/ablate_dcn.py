"""Fine-grained CenterNet head probe at b8 640 bf16: which op eats the step?

  A: res50 trunk (stem..res5) fwd+bwd
  B: full deconv head (3x DCN+ConvTranspose) fwd+bwd
  C: single DCN block per stage shape, fwd+bwd
  D: single ConvTranspose per stage shape, fwd+bwd
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.layers.precision import precision_policy

B, ITERS = 8, 10


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]  # queued; fence once
    out = outs[-1]
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:34s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    with precision_policy(jnp.bfloat16):
        from basedet_tpu.layers.head.center_head import CenternetDeconv
        from basedet_tpu.layers.blocks.deformable import ModulatedDeformConv
        from basedet_tpu.models.cls.resnet import ResNet
        from flax import linen as nn
        from basedet_tpu.layers.precision import ConvTranspose

        # A: trunk
        trunk = ResNet(arch="resnet50", out_features=("res5",), train=True,
                       norm="FrozenBN")
        x = jnp.asarray(rng.rand(B, 640, 640, 3).astype(np.float32),
                        dtype=jnp.bfloat16)
        tv = trunk.init(jax.random.PRNGKey(0), x)

        def trunk_loss(v, x):
            return jnp.sum(trunk.apply(v, x)["res5"].astype(jnp.float32))

        timeit("res50 trunk fwd", jax.jit(trunk_loss), tv, x)
        timeit("res50 trunk fwd+bwd",
               jax.jit(jax.grad(trunk_loss, argnums=0)), tv, x)

        # B: full deconv head
        head = CenternetDeconv(channels=(2048, 256, 128, 64), train=True)
        f5 = jnp.asarray(rng.rand(B, 20, 20, 2048).astype(np.float32),
                         dtype=jnp.bfloat16)
        hv = head.init(jax.random.PRNGKey(0), f5)

        def head_loss(v, f):
            out, _ = head.apply(v, f, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))

        timeit("deconv head fwd", jax.jit(head_loss), hv, f5)
        timeit("deconv head fwd+bwd",
               jax.jit(jax.grad(head_loss, argnums=0)), hv, f5)

        # C/D: per-stage DCN + ConvTranspose
        for cin, cout, hw in ((2048, 256, 20), (256, 128, 40), (128, 64, 80)):
            f = jnp.asarray(rng.rand(B, hw, hw, cin).astype(np.float32),
                            dtype=jnp.bfloat16)
            dcn = ModulatedDeformConv(cout)
            dv = dcn.init(jax.random.PRNGKey(0), f)

            def dcn_loss(v, f):
                return jnp.sum(dcn.apply(v, f).astype(jnp.float32))

            timeit(f"DCN {cin}->{cout}@{hw} fwd+bwd",
                   jax.jit(jax.grad(dcn_loss, argnums=0)), dv, f)

            deconv = ConvTranspose(cout, (4, 4), (2, 2), padding=[(1, 1), (1, 1)])
            f2 = jnp.asarray(rng.rand(B, hw, hw, cout).astype(np.float32),
                             dtype=jnp.bfloat16)
            cv = deconv.init(jax.random.PRNGKey(0), f2)

            def dc_loss(v, f):
                return jnp.sum(deconv.apply(v, f).astype(jnp.float32))

            timeit(f"deconv {cout}@{hw}->{hw*2} fwd+bwd",
                   jax.jit(jax.grad(dc_loss, argnums=0)), cv, f2)


if __name__ == "__main__":
    main()

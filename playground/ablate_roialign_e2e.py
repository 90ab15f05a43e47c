"""RoIAlign fwd+bwd at Faster R-CNN production shapes, both backends."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.ops.roi_align_pallas import pool_rois_multilevel
from basedet_tpu.ops.roi_align_separable import multilevel_roi_align_batched

B, R, REPS, N_TIMED = 8, 512, 4, 5


def main():
    rng = np.random.RandomState(0)
    sizes = [(160, 160), (80, 80), (40, 40), (20, 20)]
    feats = tuple(
        jnp.asarray(rng.randn(B, h, w, 256).astype(np.float32),
                    dtype=jnp.bfloat16) for h, w in sizes)
    props = jnp.abs(jnp.asarray(rng.rand(B, R, 4).astype(np.float32))) * 600
    rois = jnp.concatenate(
        [jnp.minimum(props[..., :2], props[..., 2:]),
         jnp.maximum(props[..., :2], props[..., 2:])], -1)

    for name, op in (
        ("pallas fwd+bwd",
         lambda fs, r: pool_rois_multilevel(fs, r, (4, 8, 16, 32), (7, 7))),
        ("xla-sep fwd+bwd",
         lambda fs, r: multilevel_roi_align_batched(
             list(fs), r, (4, 8, 16, 32), (7, 7))),
        ("pallas fwd", None),
        ("xla-sep fwd", None),
    ):
        if op is not None:
            @jax.jit
            def prog(fs, r, op=op):
                def loss(fs):
                    acc = jnp.float32(0)
                    for k in range(REPS):
                        out = op(fs, r + jnp.float32(k))
                        acc += out.astype(jnp.float32).sum()
                    return acc
                l, g2 = jax.value_and_grad(loss)(fs)
                return l + sum(x.astype(jnp.float32).sum() for x in g2)
        else:
            fwd_op = (
                (lambda fs, r: pool_rois_multilevel(fs, r, (4, 8, 16, 32),
                                                    (7, 7)))
                if "pallas" in name else
                (lambda fs, r: multilevel_roi_align_batched(
                    list(fs), r, (4, 8, 16, 32), (7, 7))))

            @jax.jit
            def prog(fs, r, op=fwd_op):
                acc = jnp.float32(0)
                for k in range(REPS):
                    out = op(fs, r + jnp.float32(k))
                    acc += out.astype(jnp.float32).sum()
                return acc

        s = float(np.asarray(prog(feats, rois)))
        t0 = time.perf_counter()
        outs = [prog(feats, rois) for _ in range(N_TIMED)]
        s = float(np.asarray(outs[-1]))
        dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
        print(f"{name:20s} {dt:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

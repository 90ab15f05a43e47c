"""iou_pallas vs fused-jnp box_iou A/B at detection problem sizes.

Evidence probe for the claim in structures/box_ops.py:9-11 ("measured on-TPU
the Pallas tile kernel does not beat the XLA fusion at detection sizes").
Run on the chip; if the Pallas kernel wins at any production size, flip
box_ops.box_iou to dispatch to it; if it loses everywhere, record the
numbers here/ROADMAP and keep the jnp path.

Queue-and-fence-once timing (per-call scalar readback pays a ~30 ms axon
tunnel round-trip).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.ops.iou_pallas import box_iou_pallas
from basedet_tpu.structures.box_ops import box_iou
from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

REPS, N_TIMED = 16, 5

# (M, N) pairs seen in production: IoU matcher (anchors x gt),
# SimOTA (fg-candidates x gt), NMS prep, COCOeval-style all-pairs
CASES = [
    (76725, 100),   # RetinaNet 800x1216 anchors x padded gt
    (8400, 100),    # YOLOX 640 anchors x gt
    (16384, 512),   # RPN topk x proposals
    (4096, 4096),   # square stress (tile-friendliest shape)
    (1000, 1000),   # post-NMS eval
]


def bench(fn, a, b):
    @jax.jit
    def prog(a, b):
        acc = jnp.float32(0)
        for r in range(REPS):
            acc += fn(a + jnp.float32(r), b).astype(jnp.float32).sum()
        return acc

    float(np.asarray(prog(a, b)))  # compile + warm
    t0 = time.perf_counter()
    outs = [prog(a, b) for _ in range(N_TIMED)]
    float(np.asarray(outs[-1]))  # ONE fence
    return (time.perf_counter() - t0) / (N_TIMED * REPS) * 1e3


def main():
    rng = np.random.RandomState(0)
    for M, N in CASES:
        def boxes(n):
            xy = rng.rand(n, 2).astype(np.float32) * 800
            wh = rng.rand(n, 2).astype(np.float32) * 120 + 4
            return jnp.asarray(np.concatenate([xy, xy + wh], -1))

        a, b = boxes(M), boxes(N)
        t_jnp = bench(box_iou, a, b)
        t_pal = bench(lambda x, y: box_iou_pallas(x, y), a, b)
        flop = 2 * M * N * 12 / 1e9  # ~12 flops per pair, rough
        print(
            f"M={M:6d} N={N:5d}: jnp {t_jnp:7.3f} ms  pallas {t_pal:7.3f} ms "
            f"({t_jnp / t_pal:4.2f}x) ~{flop / t_jnp:5.1f} GF/ms jnp"
        )


if __name__ == "__main__":
    main()

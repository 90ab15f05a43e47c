"""Phase bisect of the Faster R-CNN b8 640 AMP train step.

Times each stage as its own jitted program (REPS-amortized) at the exact
shapes of the production step:
  A  backbone(R50)+FPN+RPN head fwd+bwd
  B  find_top_proposals (decode+topk+NMS), fwd only (stop_gradient'ed)
  C  rpn_ground_truth + rpn losses fwd+bwd (loss grads w.r.t. logits)
  D  rcnn_sample_single (IoU match + quota sampling)
  E  roi_align fwd+bwd (both backends)
  F  RCNNPredictor (2xFC heads) fwd+bwd on pooled rois
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.configs import FasterRCNNConfig

B, REPS, N_TIMED = 8, 4, 5
cfg = FasterRCNNConfig()
cfg.MODEL.BATCHSIZE = B


def timed(name, prog, *args):
    # queue all calls, fence once: per-call scalar readback pays the ~30 ms
    # axon round-trip per call and inflates every phase by RTT/REPS
    s = float(np.asarray(prog(*args)))
    t0 = time.perf_counter()
    outs = [prog(*args) for _ in range(N_TIMED)]
    s = float(np.asarray(outs[-1]))
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)


def main():
    from basedet_tpu.layers.backbone.build import make_backbone
    from basedet_tpu.layers.backbone.fpn import FPN
    from basedet_tpu.layers.common.anchor_generator import DefaultAnchorGenerator
    from basedet_tpu.layers.common.matcher import Matcher
    from basedet_tpu.layers.head.rcnn import (
        RCNNPredictor, rcnn_losses, rcnn_sample_single,
    )
    from basedet_tpu.layers.precision import precision_policy
    from basedet_tpu.models.det.rpn import (
        RPNHead, find_top_proposals_single, rpn_ground_truth_single, rpn_losses,
    )
    from basedet_tpu.ops.roi_align_pallas import pool_rois_multilevel
    from basedet_tpu.ops.roi_align_separable import multilevel_roi_align_batched
    from basedet_tpu.structures import BoxCoder
    from flax import linen as nn

    m = cfg.MODEL
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, 640, 640, 3).astype(np.float32),
                      dtype=jnp.bfloat16)

    with precision_policy(jnp.bfloat16):
        # ---- A: trunk fwd+bwd
        class Trunk(nn.Module):
            train: bool = True

            @nn.compact
            def __call__(self, x):
                bu = make_backbone(
                    "resnet50", norm="FrozenBN", freeze_at=2,
                    out_features=("res2", "res3", "res4", "res5"),
                    train=self.train)(x)
                feats = FPN(in_features=("res2", "res3", "res4", "res5"),
                            strides=(4, 8, 16, 32), out_channels=256,
                            norm="", top_block="p6", train=self.train,
                            name="fpn")(bu)
                fl = [feats[k] for k in ("p2", "p3", "p4", "p5", "p6")]
                lg, of = RPNHead(channels=256, num_cell_anchors=3,
                                 name="rpn")(fl)
                return fl, lg, of

        trunk = Trunk()
        params = trunk.init(jax.random.PRNGKey(0), img)

        @jax.jit
        def prog_a(p, x):
            def loss(p):
                acc = jnp.float32(0)
                for k in range(REPS):
                    fl, lg, of = trunk.apply(p, x + jnp.bfloat16(k))
                    acc += sum(z.astype(jnp.float32).sum() for z in lg)
                    acc += sum(z.astype(jnp.float32).sum() for z in of)
                return acc
            l, g = jax.value_and_grad(loss)(p)
            return l + jax.tree_util.tree_reduce(
                lambda a, b: a + b.astype(jnp.float32).sum(), g, jnp.float32(0))

        timed("A trunk R50+FPN+RPNhead fwd+bwd", prog_a, params, img)

        # shared synthetic tensors at production shapes
        sizes = [(160, 160), (80, 80), (40, 40), (20, 20), (10, 10)]
        feats = [jnp.asarray(rng.randn(B, h, w, 256).astype(np.float32),
                             dtype=jnp.bfloat16) for h, w in sizes]
        A = 3
        flat_logits = [jnp.asarray(rng.randn(B, h * w * A).astype(np.float32))
                       for h, w in sizes]
        flat_offsets = [
            jnp.asarray(0.1 * rng.randn(B, h * w * A, 4).astype(np.float32))
            for h, w in sizes]

        anchor_gen = DefaultAnchorGenerator(
            anchor_scales=m.ANCHOR.SCALES, anchor_ratios=m.ANCHOR.RATIOS,
            strides=(4, 8, 16, 32, 64), offset=m.ANCHOR.OFFSET)
        anchors_list = anchor_gen(sizes)
        rpn_coder = BoxCoder(tuple(m.RPN_BOX_REG.MEAN),
                             tuple(m.RPN_BOX_REG.STD))
        rcnn_coder = BoxCoder(tuple(m.RCNN_BOX_REG.MEAN),
                              tuple(m.RCNN_BOX_REG.STD))
        im_info = jnp.tile(jnp.asarray([640., 640., 640., 640., 8.]), (B, 1))

        # ---- B: proposals
        @jax.jit
        def prog_b(lgs, ofs, info):
            acc = jnp.float32(0)
            for k in range(REPS):
                props, scores, valid = jax.vmap(
                    lambda lg, of, i: find_top_proposals_single(
                        lg, of, anchors_list, (i[0], i[1]), rpn_coder,
                        m.RPN.TRAIN_PREV_NMS_TOPK, m.RPN.TRAIN_POST_NMS_TOPK,
                        m.RPN.NMS_THRESHOLD,
                    )
                )([x + jnp.float32(k) for x in lgs], ofs, info)
                acc += props.sum() + scores.sum() + valid.sum()
            return acc

        timed("B find_top_proposals (topk+decode+NMS)", prog_b,
              flat_logits, flat_offsets, im_info)

        # ---- C: RPN GT + losses fwd+bwd
        gt = np.zeros((B, 32, 5), np.float32)
        gt[:, :8, 0] = rng.rand(B, 8) * 500
        gt[:, :8, 1] = rng.rand(B, 8) * 500
        gt[:, :8, 2] = gt[:, :8, 0] + rng.rand(B, 8) * 120 + 8
        gt[:, :8, 3] = gt[:, :8, 1] + rng.rand(B, 8) * 120 + 8
        gt[:, :8, 4] = 1 + (rng.rand(B, 8) * 79).astype(int)
        gt_boxes = jnp.asarray(gt)
        num_gt = jnp.full((B,), 8, jnp.int32)
        matcher = Matcher(tuple(m.MATCHER.THRESHOLDS),
                          tuple(m.MATCHER.LABELS), m.MATCHER.ALLOW_LOW_QUALITY)
        anchors = jnp.concatenate(anchors_list, axis=0)

        @jax.jit
        def prog_c(lgs, ofs, g, n):
            def loss(lgs, ofs):
                acc = jnp.float32(0)
                for k in range(REPS):
                    rngs = jax.random.split(jax.random.PRNGKey(k), B)
                    lab, off = jax.vmap(
                        lambda r, gg, nn_: rpn_ground_truth_single(
                            r, anchors, gg, nn_, matcher, rpn_coder,
                            m.RPN.NUM_SAMPLE_ANCHORS,
                            int(m.RPN.POSITIVE_ANCHOR_RATIO
                                * m.RPN.NUM_SAMPLE_ANCHORS),
                        )
                    )(rngs, g, n)
                    al = jnp.concatenate(lgs, axis=1) + jnp.float32(k)
                    ao = jnp.concatenate(ofs, axis=1)
                    lc, lb = rpn_losses(al, ao, lab, off,
                                        cfg.MODEL.LOSSES.RPN_SMOOTH_L1_BETA)
                    acc += lc + lb
                return acc
            l, g2 = jax.value_and_grad(loss, argnums=(0, 1))(lgs, ofs)
            return l + jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum(), g2, jnp.float32(0))

        timed("C rpn GT+losses fwd+bwd", prog_c,
              flat_logits, flat_offsets, gt_boxes, num_gt)

        # ---- D: rcnn sampling
        props = jnp.abs(jnp.asarray(
            rng.rand(B, 1000, 4).astype(np.float32))) * 600
        props = jnp.concatenate(
            [jnp.minimum(props[..., :2], props[..., 2:]),
             jnp.maximum(props[..., :2], props[..., 2:])], -1)
        pvalid = jnp.ones((B, 1000), jnp.bool_)

        @jax.jit
        def prog_d(p, pv, g, n):
            acc = jnp.float32(0)
            for k in range(REPS):
                rngs = jax.random.split(jax.random.PRNGKey(k), B)
                rois, labels, targets, w = jax.vmap(
                    lambda r, pp, pvv, gg, nn_: rcnn_sample_single(
                        r, pp, pvv, gg, nn_, m.RCNN.NUM_ROIS,
                        m.RCNN.FG_RATIO, m.RCNN.FG_THRESHOLD,
                        m.RCNN.BG_THRESHOLD_HIGH, m.RCNN.BG_THRESHOLD_LOW,
                        rcnn_coder)
                )(rngs, p + jnp.float32(k), pv, g, n)
                acc += rois.sum() + labels.sum() + targets.sum() + w.sum()
            return acc

        timed("D rcnn_sample (match+quota)", prog_d,
              props, pvalid, gt_boxes, num_gt)

        # ---- E: roi align fwd+bwd both backends
        rois = props[:, :512]
        pool_feats = feats[:4]

        for name, op in (
            ("E roi_align pallas fwd+bwd",
             lambda fs, r: pool_rois_multilevel(fs, r, (4, 8, 16, 32), (7, 7))),
            ("E roi_align xla-sep fwd+bwd",
             lambda fs, r: multilevel_roi_align_batched(
                 list(fs), r, (4, 8, 16, 32), (7, 7))),
        ):
            @jax.jit
            def prog_e(fs, r, op=op):
                def loss(fs):
                    acc = jnp.float32(0)
                    for k in range(REPS):
                        out = op(fs, r + jnp.float32(k))
                        acc += out.astype(jnp.float32).sum()
                    return acc
                l, g2 = jax.value_and_grad(loss)(fs)
                return l + sum(x.astype(jnp.float32).sum() for x in g2)

            timed(name, prog_e, tuple(pool_feats), rois)

        # ---- F: rcnn predictor fwd+bwd
        pooled = jnp.asarray(rng.randn(B * 512, 7, 7, 256).astype(np.float32),
                             dtype=jnp.bfloat16)
        pred = RCNNPredictor(num_classes=81, name="rcnn")
        pparams = pred.init(jax.random.PRNGKey(0), pooled)
        labels = jnp.asarray((rng.rand(B * 512) * 81).astype(np.int32))
        targets = jnp.asarray(0.1 * rng.randn(B * 512, 4).astype(np.float32))
        weights = jnp.asarray((rng.rand(B * 512) > 0.5).astype(np.float32))

        @jax.jit
        def prog_f(p, x):
            def loss(p):
                acc = jnp.float32(0)
                for k in range(REPS):
                    lg, dl = pred.apply(p, x + jnp.bfloat16(k))
                    lc, lb = rcnn_losses(
                        lg, dl, labels, targets, weights,
                        cfg.MODEL.LOSSES.RCNN_SMOOTH_L1_BETA)
                    acc += lc + lb
                return acc
            l, g2 = jax.value_and_grad(loss)(p)
            return l + jax.tree_util.tree_reduce(
                lambda a, b: a + b.astype(jnp.float32).sum(), g2,
                jnp.float32(0))

        timed("F rcnn predictor+losses fwd+bwd", prog_f, pparams, pooled)


if __name__ == "__main__":
    main()

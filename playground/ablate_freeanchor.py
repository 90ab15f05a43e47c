"""Decompose the FreeAnchor bag-loss cost (VERDICT r4 weak item #4).

FreeAnchor shares RetinaNet's network (models/det/free_anchor.py subclasses
RetinaNet; only get_losses differs), yet trains at 152 img/s vs RetinaNet's
222 (b8@640 amp, logs/bench_sweep_r4.log). Each phase here is one jitted
value_and_grad program over the SAME net with a different loss tail:

  retinanet      - RetinaNet focal/smooth-l1 loss (the 222 img/s reference)
  fa_full        - full FreeAnchor loss
  fa_posonly     - bag (positive) term only
  fa_negonly     - focal negative term only (includes the box_prob scatter)
  fa_neg_noscat  - negative term with box_prob := 0 (scatter+topk removed)

fa_negonly - fa_neg_noscat prices the top-P scatter; fa_posonly prices the
bag section (two K x R IoU products + gather + softmax-weighted bag).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from types import SimpleNamespace

from basedet_tpu.engine.train_state import TrainState, make_train_step
from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch
from basedet_tpu.utils import all_register
from basedet_tpu.utils.dummy import DummyLoader

BATCH, IMG, ITERS = 8, 640, 10


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]  # queued; fence once
    out = outs[-1]
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:34s} {dt:8.2f} ms   {BATCH / dt * 1e3:7.1f} img/s", flush=True)
    return dt


def make_fa_loss(model, mode: str):
    """FreeAnchor loss variants (mirrors free_anchor.py get_losses with
    section switches; probe-only duplication)."""
    from basedet_tpu.layers.losses import smooth_l1_loss
    from basedet_tpu.models.det.free_anchor import _safelog, _topk
    from basedet_tpu.models.det.retinanet import _flatten_level
    from basedet_tpu.structures import box_iou

    def loss_fn(variables, batch):
        inputs = model.pre_process(batch, train=True)
        module = model.make_module(train=True)
        (logits_list, offsets_list), _ = module.apply(
            variables, inputs["image"], mutable=["batch_stats"]
        )
        feat_sizes = [tuple(x.shape[1:3]) for x in logits_list]
        anchors = jnp.concatenate(model.anchor_gen(feat_sizes), axis=0)
        pred_logits = jnp.concatenate(
            [_flatten_level(x, model.num_classes) for x in logits_list], axis=1
        )
        pred_offsets = jnp.concatenate(
            [_flatten_level(x, 4) for x in offsets_list], axis=1
        )
        pred_scores = jax.nn.sigmoid(pred_logits)

        lcfg = model.cfg.MODEL.LOSSES
        bucket = model.cfg.MODEL.BUCKET
        B_size = int(bucket.BUCKET_SIZE)
        t1 = bucket.BOX_IOU_THRESH
        gamma, alpha = lcfg.FOCAL_LOSS_GAMMA, lcfg.FOCAL_LOSS_ALPHA
        eps, C = 1e-7, model.num_classes
        gt_boxes = inputs["gt_boxes"]
        num_valid = inputs["img_info"][:, 4].astype(jnp.int32)
        approx = bool(bucket.get("APPROX_TOPK", True))

        def per_image(gt, n, scores, offsets):
            K = gt.shape[0]
            R = anchors.shape[0]
            gt_valid = jnp.arange(K) < n
            labels = jnp.clip(gt[:, 4].astype(jnp.int32) - 1, 0, C - 1)

            if mode in ("negonly", "neg_noscat"):
                pos_loss = jnp.zeros((K,))
            else:
                quality = jax.lax.stop_gradient(box_iou(gt[:, :4], anchors))
                quality = jnp.where(gt_valid[:, None], quality, -1.0)
                _, matched = _topk(quality, B_size, approx)
                m_flat = matched.reshape(-1)
                matched_score = scores[m_flat, :].reshape(K, B_size, C)
                matched_score = jnp.take_along_axis(
                    matched_score, labels[:, None, None], axis=2
                )[..., 0]
                m_anchors = anchors[m_flat]
                gt_broad = jnp.repeat(gt[:, :4], B_size, axis=0)
                m_off_target = model.box_coder.encode(m_anchors, gt_broad)
                reg_loss = (
                    smooth_l1_loss(
                        offsets[m_flat], m_off_target,
                        beta=lcfg.SMOOTH_L1_BETA,
                    ).sum(axis=-1) * lcfg.REG_LOSS_WEIGHT
                ).reshape(K, B_size)
                bag = matched_score * jnp.exp(-reg_loss)
                w = 1.0 / jnp.maximum(1.0 - bag, eps)
                w = w / jnp.sum(w, axis=1, keepdims=True)
                pos_loss = -_safelog(jnp.sum(w * bag, axis=1)) * gt_valid

            if mode == "posonly":
                box_prob = jnp.zeros((anchors.shape[0], C))
            elif mode == "neg_noscat":
                box_prob = jnp.zeros((anchors.shape[0], C))
            else:
                pred_box = jax.lax.stop_gradient(
                    model.box_coder.decode(anchors, offsets)
                )
                overlaps = jax.lax.stop_gradient(
                    box_iou(gt[:, :4], pred_box)
                )
                overlaps = jnp.where(gt_valid[:, None], overlaps, 0.0)
                t2 = jnp.clip(
                    jnp.max(overlaps, axis=1, keepdims=True), t1 + eps, 1.0
                )
                gt_prob = jnp.clip((overlaps - t1) / (t2 - t1), 0.0, 1.0)
                gt_prob = jnp.where(gt_valid[:, None], gt_prob, 0.0)
                P = min(128, anchors.shape[0])
                top_prob, top_idx = _topk(gt_prob, P, approx)
                c_idx = jnp.broadcast_to(labels[:, None], (K, P))
                box_prob = (
                    jnp.zeros((anchors.shape[0], C))
                    .at[top_idx.reshape(-1), c_idx.reshape(-1)]
                    .max(top_prob.reshape(-1))
                )
            return pos_loss, box_prob

        pos_losses, box_probs = jax.vmap(per_image)(
            gt_boxes, num_valid, pred_scores, pred_offsets
        )
        num_fg = jnp.maximum(jnp.sum(num_valid).astype(jnp.float32), 1.0)
        pos_loss = jnp.sum(pos_losses) / num_fg * alpha
        if mode == "posonly":
            return pos_loss
        neg_scores = pred_scores * (1.0 - box_probs)
        neg_loss = (
            jnp.sum(neg_scores ** gamma * (-_safelog(1.0 - neg_scores)))
            / jnp.maximum(num_fg * B_size, 1.0) * (1 - alpha)
        )
        if mode in ("negonly", "neg_noscat"):
            return neg_loss
        return pos_loss + neg_loss

    return loss_fn


def main():
    all_register()
    from basedet_tpu.tools.sanity_e2e import _make_cfg

    mesh = make_mesh((("data", 1),), devices=jax.devices()[:1])
    results = {}

    for name in ("retinanet", "free_anchor"):
        a = SimpleNamespace(steps=100, batch=BATCH, size=IMG, out="/tmp/fa",
                            no_aug=True)
        cfg = _make_cfg(name, a)
        cfg.MODEL.BACKBONE.NAME = "resnet50"
        cfg.MODEL.BACKBONE.NORM = "FrozenBN"
        cfg.MODEL.BACKBONE.FREEZE_AT = 2
        cfg.DATA.NUM_CLASSES = 80
        cfg.DATA.MAX_INSTANCES = 100
        cfg.TRAINER.AMP.ENABLE = True
        model = cfg.build_model()
        solver = cfg.build_solver()
        step = jax.jit(make_train_step(model, solver, cfg))
        variables = model.init_variables(
            jax.random.PRNGKey(0), image_size=(IMG, IMG)
        )
        state = replicate_state(TrainState.create(variables, solver), mesh)
        loader = DummyLoader(
            batch_size=BATCH, image_size=(IMG, IMG), max_instances=100
        )
        batch = shard_batch(loader.make_batch(0), mesh)
        results[name] = timeit(f"{name} train_step", step, state, batch)

        if name == "free_anchor":
            for mode in ("full", "posonly", "negonly", "neg_noscat"):
                loss_fn = make_fa_loss(model, mode)

                def g(v, b, _f=loss_fn):
                    return jax.grad(
                        lambda p: _f({"params": p, **{
                            k: vv for k, vv in v.items() if k != "params"
                        }}, b)
                    )(v["params"])

                gj = jax.jit(g)
                vf = state.variables()
                results[mode] = timeit(f"fa loss[{mode}] f+b", gj, vf, batch)

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()

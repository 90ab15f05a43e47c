"""DETR non-convergence bisect probe.

Overfits a tiny synthetic set (N images seen in full every step) and logs
what the sanity AP number can't show:
  * per-term last-layer losses (ce / bbox / giou),
  * matching quality: auction+greedy assignment cost vs scipy-optimal cost
    on the SAME learned cost matrix,
  * matching stability: how many targets changed owner query between probes,
  * raw predicted boxes vs gt for image 0 at the end.

Reference loss recipe: /root/reference/basedet/models/det/detr.py:146-221.
Usage: python -m basedet_tpu.tools.probe_detr [--steps 1500] [--images 8]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--out", type=str, default="/tmp/probe_detr")
    p.add_argument(
        "--minibatch", type=int, default=0,
        help="if >0, sample this many images per step from the --images "
             "pool instead of training on one constant full batch — "
             "reproduces the sanity_e2e regime (shuffled batches) with "
             "per-term loss logging to isolate WHERE shuffled DETR stalls",
    )
    p.add_argument("--scipy-match", action="store_true",
                   help="replace the on-device auction matching with exact "
                        "scipy Hungarian via pure_callback (isolates "
                        "matching quality from everything else); requires "
                        "--cpu — the axon TPU runtime has no host callbacks")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env JAX_PLATFORMS is "
                        "pre-set to axon here; config.update wins)")
    p.add_argument("--exact-auction", action="store_true",
                   help="run the auction matcher at near-exact settings "
                        "(eps_scale 1e-5, 50k iteration cap) — TPU-"
                        "compatible stand-in for --scipy-match")
    p.add_argument("--lr", type=float, default=None,
                   help="override SOLVER.BASIC_LR")
    p.add_argument("--flat-adamw", type=float, default=None,
                   help="bypass DetrSolver entirely: plain optax "
                        "clip(1.0)+adamw at THIS absolute lr for every "
                        "param (no warmup, no backbone ratio, no batch "
                        "scaling) — the torch-oracle recipe, isolating "
                        "solver/recipe differences from model bugs")
    p.add_argument("--backbone-norm", type=str, default=None,
                   help="override MODEL.BACKBONE.NORM (e.g. GN) — tests "
                        "the trainable-BN-under-shuffled-minibatches theory")
    p.add_argument("--dropout", type=float, default=None,
                   help="override MODEL.TRANSFORMER.DROPOUT (sanity zeroes "
                        "it; the reference trains DETR with 0.1 — dropout "
                        "noise may help escape the class-marginal saddle)")
    args = p.parse_args()

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    from types import SimpleNamespace

    from basedet_tpu.data.coco_loader import TestLoader
    from basedet_tpu.data.collators.pad_collator import DetectionPadCollator
    from basedet_tpu.data.datasets.coco import COCODataset
    from basedet_tpu.engine.train_state import TrainState, make_train_step
    from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch
    from basedet_tpu.tools.sanity_e2e import _make_cfg, make_synthetic_coco
    from basedet_tpu.utils import all_register, logger, setup_logger
    from basedet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    all_register()
    setup_logger()
    (train_imgs, train_anno), _ = make_synthetic_coco(
        args.out, n_train=args.images, n_val=4, size=args.size
    )

    # BATCHSIZE drives the lr scale (solver/build.py _scaled_lr_wd:
    # lr = BASIC_LR * BATCHSIZE) — it must be the PER-STEP batch, not the
    # pool size. The r5c/f/g probes ran with batch=pool (lr 3-25x the
    # sanity_e2e value) before this fix; their collapse trajectories are
    # still valid evidence (the e2e runs collapsed at the correct lr too)
    # but their absolute lr was wrong.
    cfg_args = SimpleNamespace(
        steps=args.steps, batch=(args.minibatch or args.images),
        size=args.size, out=args.out, no_aug=False,
    )
    cfg = _make_cfg("detr", cfg_args)
    if args.lr is not None:
        cfg.SOLVER.BASIC_LR = args.lr
    if args.backbone_norm is not None:
        cfg.MODEL.BACKBONE.NORM = args.backbone_norm
    if args.dropout is not None:
        cfg.MODEL.TRANSFORMER.DROPOUT = args.dropout
    model = cfg.build_model()

    if args.exact_auction:
        orig_match = model._match_single

        def exact_match(probs, boxes, tgt_boxes, tgt_cls, tgt_valid):
            m = model.cfg.MODEL.MATCHER
            cost_class = -probs[:, tgt_cls]
            cost_bbox = jnp.sum(
                jnp.abs(boxes[:, None, :] - tgt_boxes[None, :, :]), axis=-1
            )
            from basedet_tpu.layers.losses import iou_loss as _iou

            giou = -(
                _iou(
                    jnp.broadcast_to(
                        boxes[:, None, :], cost_bbox.shape + (4,)
                    ),
                    jnp.broadcast_to(
                        tgt_boxes[None, :, :], cost_bbox.shape + (4,)
                    ),
                    box_mode="xcycwh", loss_type="giou",
                ) - 1.0
            )
            cost = (
                m.SET_WEIGHT_CLASS * cost_class
                + m.SET_WEIGHT_BBOX * cost_bbox
                + m.SET_WEIGHT_GIOU * (-giou)
            )
            return hungarian_match_owner(
                cost, valid=tgt_valid, n_iters=50000, eps_scale=1e-5
            )

        from basedet_tpu.layers.common.matcher import hungarian_match_owner

        model._match_single = exact_match
        logger.info("matching: near-exact auction (eps 1e-5, 50k cap)")

    if args.scipy_match:
        from scipy.optimize import linear_sum_assignment

        def scipy_owner(cost, valid):
            def host_match(c, v):
                c = np.asarray(c, np.float64)
                v = np.asarray(v, bool)
                K = c.shape[1]
                owner = np.full((K,), -1, np.int32)
                cols = np.where(v)[0]
                if len(cols):
                    r, cc = linear_sum_assignment(c[:, cols])
                    owner[cols[cc]] = r.astype(np.int32)
                return owner

            return jax.pure_callback(
                host_match,
                jax.ShapeDtypeStruct((cost.shape[1],), jnp.int32),
                cost, valid, vmap_method="sequential",
            )

        import basedet_tpu.models.det.detr as detr_mod

        orig = model._match_single

        def patched(probs, boxes, tgt_boxes, tgt_cls, tgt_valid):
            m = model.cfg.MODEL.MATCHER
            cost_class = -probs[:, tgt_cls]
            cost_bbox = jnp.sum(
                jnp.abs(boxes[:, None, :] - tgt_boxes[None, :, :]), axis=-1
            )
            from basedet_tpu.layers.losses import iou_loss

            giou = -(
                iou_loss(
                    jnp.broadcast_to(
                        boxes[:, None, :], cost_bbox.shape + (4,)
                    ),
                    jnp.broadcast_to(
                        tgt_boxes[None, :, :], cost_bbox.shape + (4,)
                    ),
                    box_mode="xcycwh", loss_type="giou",
                ) - 1.0
            )
            cost = (
                m.SET_WEIGHT_CLASS * cost_class
                + m.SET_WEIGHT_BBOX * cost_bbox
                + m.SET_WEIGHT_GIOU * (-giou)
            )
            # matching is not differentiated (losses stop_gradient the owner)
            # — cut tangents so pure_callback never sees a JVP trace
            return scipy_owner(
                jax.lax.stop_gradient(cost), jax.lax.stop_gradient(tgt_valid)
            )

        model._match_single = patched
        logger.info("matching: scipy Hungarian via pure_callback")

    solver = cfg.build_solver()
    if args.flat_adamw is not None:
        import optax

        from basedet_tpu.solver.build import Solver

        flat_lr = args.flat_adamw
        solver = Solver(
            tx=optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(flat_lr, weight_decay=1e-4),
            ),
            lr_schedule=lambda step: flat_lr,
            base_lr=flat_lr,
            max_iters=args.steps,
        )
        logger.info(f"solver: flat AdamW lr={flat_lr} (oracle recipe)")
    mesh = make_mesh((("data", 1),), devices=jax.devices()[:1])
    variables = model.init_variables(
        jax.random.PRNGKey(0), image_size=(args.size, args.size)
    )
    state = replicate_state(TrainState.create(variables, solver), mesh)
    step_fn = jax.jit(make_train_step(model, solver, cfg), donate_argnums=(0,))

    ds = COCODataset(train_imgs, train_anno)
    collator = DetectionPadCollator(max_instances=8)
    full = dict(collator([ds[i] for i in range(len(ds))]))
    full.pop("image_id", None)

    if args.minibatch:
        # pre-collated pool; per-step row subset (same static shapes, so
        # ONE compiled step) — the sanity_e2e regime minus the loader
        rng_np = np.random.RandomState(0)
        batch = {
            k: jnp.asarray(v[: args.minibatch]) for k, v in full.items()
        }
        batch = shard_batch(batch, mesh)
    else:
        batch = shard_batch(full, mesh)

    for step in range(args.steps):
        if args.minibatch:
            idx = rng_np.choice(args.images, args.minibatch, replace=False)
            batch = shard_batch(
                {k: jnp.asarray(np.asarray(v)[idx]) for k, v in full.items()},
                mesh,
            )
        state, metrics = step_fn(state, batch)
        if step % 100 == 0 or step == args.steps - 1:
            logger.info(
                f"step {step}: total={float(metrics['total_loss']):.4f} "
                f"ce={float(metrics['loss_ce']):.4f} "
                f"bbox={float(metrics['loss_bbox']):.4f} "
                f"giou={float(metrics['loss_giou']):.4f}"
            )

    # ---- final diagnostics on image 0 -------------------------------------
    variables_f = state.variables()
    inputs = model._prepare(batch, train=True)  # train=True keeps gt_boxes
    module = model.make_module(train=False)
    logits_all, coords_all = module.apply(
        variables_f, inputs["image"], inputs["mask"]
    )
    logits = np.asarray(logits_all[-1])
    coords = np.asarray(coords_all[-1])
    prob = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    prob = np.asarray(prob)

    gt = np.asarray(inputs["gt_boxes"][0])
    info = np.asarray(inputs["img_info"][0])
    n = int(info[4])
    logger.info(f"image0 gt (xyxy,cls) n={n}:\n{gt[:n]}")
    sc = prob[0, :, :-1]
    top = np.argsort(-sc.max(axis=-1))[:max(n + 2, 4)]
    size = args.size
    for q in top:
        b = coords[0, q]
        xyxy = np.array([
            (b[0] - b[2] / 2) * size, (b[1] - b[3] / 2) * size,
            (b[0] + b[2] / 2) * size, (b[1] + b[3] / 2) * size,
        ])
        logger.info(
            f"  q{q}: score={sc[q].max():.3f} cls={sc[q].argmax() + 1} "
            f"box={np.round(xyxy, 1)} bg={prob[0, q, -1]:.3f}"
        )

    # ---- matching-quality audit on the final cost matrices ----------------
    try:
        from scipy.optimize import linear_sum_assignment
    except ImportError:
        linear_sum_assignment = None
    if linear_sum_assignment is not None and not args.scipy_match:
        from basedet_tpu.layers.losses import iou_loss as _il

        m = cfg.MODEL.MATCHER
        gts = np.asarray(inputs["gt_boxes"])
        infos = np.asarray(inputs["img_info"])
        worse = 0.0
        for b in range(gts.shape[0]):
            nb = int(infos[b, 4])
            if nb == 0:
                continue
            tb = gts[b, :nb, :4] / np.array(
                [size, size, size, size], np.float32
            )
            tb = np.stack([
                (tb[:, 0] + tb[:, 2]) / 2, (tb[:, 1] + tb[:, 3]) / 2,
                tb[:, 2] - tb[:, 0], tb[:, 3] - tb[:, 1],
            ], axis=-1)
            tc = np.clip(gts[b, :nb, 4].astype(int) - 1, 0, 2)
            cost_class = -prob[b][:, tc]
            cost_bbox = np.abs(
                coords[b][:, None, :] - tb[None, :, :]
            ).sum(-1)
            Q = coords.shape[1]
            g = -(np.asarray(_il(
                jnp.broadcast_to(jnp.asarray(coords[b][:, None, :]),
                                 (Q, nb, 4)),
                jnp.broadcast_to(jnp.asarray(tb[None, :, :]), (Q, nb, 4)),
                box_mode="xcycwh", loss_type="giou",
            )) - 1.0)
            cost = (m.SET_WEIGHT_CLASS * cost_class
                    + m.SET_WEIGHT_BBOX * cost_bbox
                    + m.SET_WEIGHT_GIOU * (-g))
            r, c = linear_sum_assignment(cost)
            opt = cost[r, c].sum()
            from basedet_tpu.layers.common.matcher import (
                hungarian_match_owner,
            )

            K = gts.shape[1]
            cost_pad = np.full((Q, K), 1e6, np.float32)
            cost_pad[:, :nb] = cost
            owner = np.asarray(hungarian_match_owner(
                jnp.asarray(cost_pad),
                valid=jnp.arange(K) < nb,
            ))
            ours = cost[owner[:nb], np.arange(nb)].sum()
            worse = max(worse, float(ours - opt))
            logger.info(
                f"img{b}: scipy-opt cost {opt:.4f} vs auction {ours:.4f}"
            )
        logger.info(f"max auction excess over optimal: {worse:.5f}")


if __name__ == "__main__":
    main()

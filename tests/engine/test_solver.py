"""Solver semantics: frozen-backbone masking, YOLOX no-decay groups,
LR schedules, world-scaled LR."""
import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.solver.build import DefaultSolver, DetSolver, YOLOXSolver
from basedet_tpu.solver.schedules import multistep_lr, yolox_cosine_lr
from basedet_tpu.utils import ConfigDict


def base_cfg(**solver):
    defaults = dict(
        BUILDER_NAME="DetSolver",
        OPTIMIZER_NAME="SGD",
        LR_SCHEDULER_NAME="MultiStepLR",
        BASIC_LR=0.01,
        WEIGHT_DECAY=1e-4,
        EXTRA_OPT_ARGS=dict(momentum=0.9),
        REDUCE_MODE="MEAN",
        WARM_ITERS=0,
        NUM_IMAGE_PER_EPOCH=100,
        MAX_EPOCH=10,
        LR_DECAY_STAGES=[6, 8],
        LR_DECAY_RATE=0.1,
    )
    defaults.update(solver)
    return ConfigDict(
        MODEL=dict(BATCHSIZE=2, BACKBONE=dict(FREEZE_AT=2)),
        SOLVER=defaults,
        TRAINER=dict(GRAD_CLIP=dict(ENABLE=False)),
    )


def fake_params():
    return {
        "bottom_up": {
            "conv1": {"kernel": jnp.ones((3, 3))},
            "layer1_0": {"kernel": jnp.ones((3, 3))},
            "layer3_0": {"kernel": jnp.ones((3, 3))},
        },
        "head": {
            "cls_score": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
            "bn": {"scale": jnp.ones((4,))},
        },
    }


def test_det_solver_freezes_backbone_prefix():
    cfg = base_cfg()
    solver = DetSolver.build(cfg, world_size=1)
    params = fake_params()
    opt_state = solver.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = solver.tx.update(grads, opt_state, params)
    assert np.all(np.asarray(updates["bottom_up"]["conv1"]["kernel"]) == 0)
    assert np.all(np.asarray(updates["bottom_up"]["layer1_0"]["kernel"]) == 0)
    assert np.any(np.asarray(updates["bottom_up"]["layer3_0"]["kernel"]) != 0)
    assert np.any(np.asarray(updates["head"]["cls_score"]["kernel"]) != 0)


def test_yolox_solver_no_decay_on_bias_and_scale():
    cfg = base_cfg(BUILDER_NAME="YOLOXSolver", LR_SCHEDULER_NAME="YoloxCosineLR",
                   EXTRA_LR_ARGS=dict(NO_AUG_EPOCH=2, MIN_LR_RATIO=0.05),
                   WARM_ITERS=0)
    solver = YOLOXSolver.build(cfg, world_size=1)
    params = fake_params()
    opt_state = solver.init(params)
    # zero grads: decay group still moves (weight decay), no-decay must not
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = solver.tx.update(grads, opt_state, params)
    assert np.any(np.asarray(updates["head"]["cls_score"]["kernel"]) != 0), \
        "kernels should receive weight decay"
    assert np.all(np.asarray(updates["head"]["cls_score"]["bias"]) == 0)
    assert np.all(np.asarray(updates["head"]["bn"]["scale"]) == 0)


def test_world_scaled_lr():
    cfg = base_cfg()
    s1 = DefaultSolver.build(cfg, world_size=1)
    s8 = DefaultSolver.build(cfg, world_size=8)
    assert s8.base_lr == 8 * s1.base_lr  # MEAN reduce → lr × world


def test_multistep_schedule_values():
    sched = multistep_lr(1.0, milestones=[10, 20], gamma=0.1,
                         warmup_iters=4, warmup_factor=0.0)
    assert float(sched(0)) == 0.0
    assert float(sched(2)) == 0.5
    assert float(sched(5)) == 1.0
    assert abs(float(sched(15)) - 0.1) < 1e-6
    assert abs(float(sched(25)) - 0.01) < 1e-7


def test_yolox_cosine_schedule_shape():
    sched = yolox_cosine_lr(1.0, total_iters=100, warmup_iters=10,
                            no_aug_iters=20, min_lr_ratio=0.05)
    # quadratic warmup
    assert float(sched(5)) == 0.25
    assert abs(float(sched(10)) - 1.0) < 1e-6
    # floor during no-aug tail
    assert abs(float(sched(90)) - 0.05) < 1e-6
    assert abs(float(sched(99)) - 0.05) < 1e-6
    # monotone decreasing cosine mid-section
    assert float(sched(40)) > float(sched(60)) > 0.05

"""Sharded checkpoint save→restore→resume round-trip (VERDICT r4 item #9).

Under the 8-device CPU mesh: train 2 steps, save with the REAL
CheckpointHook, restore into a FRESH differently-initialized state with the
REAL ResumeHook, and assert (a) params/opt-state/EMA/step restored exactly
and (b) two further steps are BIT-IDENTICAL to an uninterrupted 4-step run.
Reference semantics: engine/hooks.py:328-360 (ResumeHook fast-forward)."""
import os

import jax
import numpy as np
import pytest

from basedet_tpu.configs import RetinaNetConfig
from basedet_tpu.engine.hooks import CheckpointHook, ResumeHook
from basedet_tpu.engine.progress import Progress
from basedet_tpu.engine.train_state import TrainState, make_train_step
from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch
from basedet_tpu.utils import all_register

IMG = 64
BATCH = 8


def _cfg():
    all_register()
    cfg = RetinaNetConfig()
    cfg.MODEL.BACKBONE.NAME = "resnet18"
    cfg.MODEL.BATCHSIZE = BATCH
    cfg.DATA.NUM_CLASSES = 3
    cfg.DATA.MAX_INSTANCES = 4
    cfg.SOLVER.NUM_IMAGE_PER_EPOCH = 64
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.SOLVER.WARM_ITERS = 0
    cfg.TRAINER.EMA.ENABLE = True  # EMA restore must round-trip too
    return cfg


def _batches():
    rng = np.random.RandomState(0)
    batches = []
    for _ in range(4):
        gt = np.zeros((BATCH, 4, 5), np.float32)
        gt[:, 0] = [8, 8, 40, 40, 1]
        gt[:, 1] = [20, 24, 56, 60, 2]
        info = np.tile(
            np.asarray([[IMG, IMG, IMG, IMG, 2]], np.float32), (BATCH, 1)
        )
        batches.append({
            "data": rng.randn(BATCH, IMG, IMG, 3).astype(np.float32) * 30,
            "gt_boxes": gt,
            "im_info": info,
        })
    return batches


class _FakeTrainer:
    """The minimal trainer surface CheckpointHook/ResumeHook touch."""

    def __init__(self, state, mesh):
        self.state = state
        self.mesh = mesh
        self.progress = Progress(max_epoch=2, max_iter=2)
        self.ema_enabled = True


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


@pytest.mark.parametrize("n_pre", [2])
def test_sharded_ckpt_roundtrip(tmp_path, n_pre):
    cfg = _cfg()
    model = cfg.build_model()
    solver = cfg.build_solver()
    mesh = make_mesh()  # 8-device DP mesh (conftest CPU fan-out)
    assert mesh.devices.size == 8

    step_fn = jax.jit(make_train_step(model, solver, cfg))
    batches = [shard_batch(b, mesh) for b in _batches()]

    def fresh_state(seed):
        variables = model.init_variables(
            jax.random.PRNGKey(seed), image_size=(IMG, IMG)
        )
        return replicate_state(
            TrainState.create(variables, solver, ema=True), mesh
        )

    # -- uninterrupted 4-step run ------------------------------------------------
    state = fresh_state(0)
    for b in batches[:n_pre]:
        state, _ = step_fn(state, b)
    mid_state = state
    for b in batches[n_pre:]:
        state, _ = step_fn(state, b)
    final_ref = jax.device_get(state)

    # -- save at the midpoint with the real hook ----------------------------------
    save_dir = os.path.join(str(tmp_path), "ckpt")
    trainer = _FakeTrainer(mid_state, mesh)
    trainer.progress.epoch = 1
    hook = CheckpointHook(save_dir)
    hook.trainer = trainer
    hook.after_epoch()
    assert os.path.exists(os.path.join(save_dir, "last_checkpoint"))

    # -- restore into a DIFFERENTLY-initialized fresh run -------------------------
    trainer2 = _FakeTrainer(fresh_state(123), mesh)
    resume = ResumeHook(save_dir)
    resume.trainer = trainer2
    resume.before_train()

    # exact restore of every leaf: params, opt state, EMA, step counter
    got = jax.device_get(trainer2.state)
    want = jax.device_get(mid_state)
    for a, b in zip(_leaves(got), _leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state is mesh-placed (fully replicated), not host numpy
    for leaf in _leaves(trainer2.state):
        assert isinstance(leaf, jax.Array), type(leaf)
        assert leaf.sharding.is_fully_replicated
    # progress resumed at the next epoch (reference hooks.py:345)
    assert trainer2.progress.epoch == 2

    # -- two further steps are bit-identical to the uninterrupted run -------------
    state2 = trainer2.state
    for b in batches[n_pre:]:
        state2, _ = step_fn(state2, b)
    final_resumed = jax.device_get(state2)
    for a, b in zip(_leaves(final_resumed), _leaves(final_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

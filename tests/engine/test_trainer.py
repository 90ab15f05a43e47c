"""Trainer smoke test on the 8-device CPU mesh: full DP train loop with EMA,
checkpoint + resume. (The reference has NO distributed tests — SURVEY.md §4;
this is the TPU-native upgrade.)"""
import os
import shutil

import jax
import numpy as np
import pytest

from basedet_tpu.configs import RetinaNetConfig


def make_cfg(tmpdir):
    from tests.tiny import shrink

    cfg = shrink(RetinaNetConfig())
    cfg.MODEL.BATCHSIZE = 1
    cfg.DATA.TRAIN.name = "dummy"
    cfg.DATA.DUMMY_IMAGE_SIZE = (64, 64)
    cfg.DATA.MAX_INSTANCES = 4
    cfg.SOLVER.NUM_IMAGE_PER_EPOCH = jax.device_count() * 2
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.SOLVER.WARM_ITERS = 2
    cfg.TRAINER.EMA.ENABLE = True
    cfg.GLOBAL.LOG_INTERVAL = 2
    cfg.GLOBAL.CKPT_SAVE_DIR = str(tmpdir)
    return cfg


def test_multidevice_mesh_available():
    assert jax.device_count() == 8


def test_train_loop_and_resume(tmp_path):
    cfg = make_cfg(tmp_path / "ckpt")
    trainer = cfg.build_trainer()
    assert trainer.world_size == 8
    trainer.init_state(image_size=(64, 64))
    trainer.train()
    assert int(trainer.state.step) == trainer.progress.total_iter
    losses = {k: m.latest for k, m in trainer.meters.items() if "loss" in k}
    assert losses and all(np.isfinite(v) for v in losses.values())
    assert (tmp_path / "ckpt" / "latest.pkl").exists()
    assert (tmp_path / "ckpt" / "dumped_model.pkl").exists()

    # resume: fresh trainer picks up epoch from checkpoint
    cfg2 = make_cfg(tmp_path / "ckpt")
    cfg2.TRAINER.RESUME = True
    trainer2 = cfg2.build_trainer()
    trainer2.init_state(image_size=(64, 64))
    for h in trainer2.hooks:
        if type(h).__name__ == "ResumeHook":
            h.before_train()
    assert int(trainer2.state.step) == trainer.progress.total_iter


def test_ema_params_track(tmp_path):
    cfg = make_cfg(tmp_path / "ckpt2")
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TRAINER.EMA.BURNIN_ITER = 0
    trainer = cfg.build_trainer()
    trainer.init_state(image_size=(64, 64))
    trainer.train()
    # with burnin 0 and momentum<1, EMA differs from params but is close
    p = jax.tree_util.tree_leaves(trainer.state.params)[0]
    e = jax.tree_util.tree_leaves(trainer.state.ema_params)[0]
    assert p.shape == e.shape

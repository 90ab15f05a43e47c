"""Orbax async checkpoint/resume round-trip on the CPU mesh."""
import jax
import numpy as np

from basedet_tpu.configs import RetinaNetConfig


def make_cfg(tmpdir):
    cfg = RetinaNetConfig()
    cfg.MODEL.BACKBONE.NAME = "resnet18"
    cfg.MODEL.BATCHSIZE = 1
    cfg.DATA.TRAIN.name = "dummy"
    cfg.DATA.DUMMY_IMAGE_SIZE = (64, 64)
    cfg.DATA.MAX_INSTANCES = 4
    cfg.SOLVER.NUM_IMAGE_PER_EPOCH = jax.device_count()
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.SOLVER.WARM_ITERS = 1
    cfg.GLOBAL.LOG_INTERVAL = 1
    cfg.GLOBAL.CKPT_SAVE_DIR = str(tmpdir)
    cfg.GLOBAL.CKPT_BACKEND = "orbax"
    return cfg


def test_orbax_save_and_resume(tmp_path):
    cfg = make_cfg(tmp_path / "ckpt")
    trainer = cfg.build_trainer()
    trainer.init_state(image_size=(64, 64))
    trainer.train()
    steps_done = int(trainer.state.step)
    assert steps_done > 0

    cfg2 = make_cfg(tmp_path / "ckpt")
    cfg2.TRAINER.RESUME = True
    trainer2 = cfg2.build_trainer()
    trainer2.init_state(image_size=(64, 64))
    for h in trainer2.hooks:
        if type(h).__name__ == "OrbaxCheckpointHook":
            h.trainer = trainer2
            h.before_train()
    assert int(trainer2.state.step) == steps_done
    p1 = jax.tree_util.tree_leaves(trainer.state.params)[0]
    p2 = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))

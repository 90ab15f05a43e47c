"""Remat policies compile + run and preserve the loss value (REMAT changes
memory/recompute scheduling, never math)."""
import jax
import numpy as np
import pytest

from basedet_tpu.configs import YOLOXConfig
from basedet_tpu.engine.train_state import TrainState, make_train_step
from basedet_tpu.utils.dummy import DummyLoader


def _setup(remat):
    from tests.tiny import shrink

    cfg = shrink(YOLOXConfig())
    cfg.MODEL.BATCHSIZE = 2
    cfg.DATA.MAX_INSTANCES = 4
    cfg.SOLVER.WARM_ITERS = 0
    cfg.SOLVER.NUM_IMAGE_PER_EPOCH = 64
    cfg.TRAINER.REMAT = remat
    cfg.TRAINER.EMA.ENABLE = False
    model = cfg.build_model()
    solver = cfg.build_solver()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(64, 64))
    batch = DummyLoader(batch_size=2, image_size=(64, 64), max_instances=4
                        ).make_batch()
    state = TrainState.create(variables, solver)
    step = jax.jit(make_train_step(model, solver, cfg))
    return step, state, batch


def test_remat_modes_agree():
    # one test, all modes: a function-attribute reference across pytest
    # parametrizations silently skips the agreement check under -k / xdist
    losses = {}
    for remat in (False, True, "selective"):
        step, state, batch = _setup(remat)
        _, metrics = step(state, batch)
        losses[remat] = float(metrics["total_loss"])
        assert np.isfinite(losses[remat])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)
    np.testing.assert_allclose(losses["selective"], losses[False], rtol=1e-4)

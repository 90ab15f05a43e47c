"""Convergence sanity: the jitted train step overfits one fixed batch
(loss must drop substantially) — the cheapest end-to-end training check."""
import jax
import numpy as np

from basedet_tpu.configs import RetinaNetConfig
from basedet_tpu.engine.train_state import TrainState, make_train_step
from basedet_tpu.solver.build import DefaultSolver
from basedet_tpu.utils.dummy import DummyLoader


def test_overfit_single_batch():
    from tests.tiny import shrink

    cfg = shrink(RetinaNetConfig())
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.BATCHSIZE = 2
    cfg.SOLVER.BUILDER_NAME = "DefaultSolver"
    cfg.SOLVER.BASIC_LR = 0.01 / 16
    cfg.SOLVER.WARM_ITERS = 0
    cfg.SOLVER.NUM_IMAGE_PER_EPOCH = 64
    cfg.SOLVER.MAX_EPOCH = 10

    model = cfg.build_model()
    solver = DefaultSolver.build(cfg, world_size=1)
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(96, 96))
    state = TrainState.create(variables, solver, ema=False)
    step = jax.jit(make_train_step(model, solver, cfg), donate_argnums=(0,))

    batch = DummyLoader(batch_size=2, image_size=(96, 96), max_instances=4).make_batch()
    losses = []
    for _ in range(25):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, f"no convergence: {losses[0]} -> {losses[-1]}"


def test_graft_entry_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)

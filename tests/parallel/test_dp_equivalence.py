"""Data-parallel correctness: one jitted step over an 8-device mesh must
produce the same parameters as the same step on a single device with the
identical global batch (pjit auto-collectives == the reference's allreduce
callbacks, SURVEY.md §2.10)."""
import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.configs import RetinaNetConfig
from basedet_tpu.engine.train_state import TrainState, make_train_step
from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch
from basedet_tpu.solver.build import DefaultSolver
from basedet_tpu.utils.dummy import DummyLoader


def _setup():
    from tests.tiny import shrink

    cfg = shrink(RetinaNetConfig())
    cfg.MODEL.BATCHSIZE = 1
    cfg.DATA.MAX_INSTANCES = 4
    cfg.SOLVER.WARM_ITERS = 0
    cfg.SOLVER.NUM_IMAGE_PER_EPOCH = 64
    model = cfg.build_model()
    solver = DefaultSolver.build(cfg, world_size=1)
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(64, 64))
    batch = DummyLoader(
        batch_size=8, image_size=(64, 64), max_instances=4
    ).make_batch()
    return cfg, model, solver, variables, batch


def test_sharded_step_matches_single_device():
    cfg, model, solver, variables, batch = _setup()
    step = make_train_step(model, solver, cfg)

    # single device
    state1 = TrainState.create(variables, solver, ema=False)
    dev0 = jax.devices()[0]
    state1 = jax.device_put(state1, dev0)
    batch1 = jax.device_put(batch, dev0)
    state1, metrics1 = jax.jit(step)(state1, batch1)

    # 8-device mesh, batch sharded
    mesh = make_mesh()
    state8 = replicate_state(TrainState.create(variables, solver, ema=False), mesh)
    batch8 = shard_batch(dict(batch), mesh)
    state8, metrics8 = jax.jit(step)(state8, batch8)

    np.testing.assert_allclose(
        float(metrics1["total_loss"]), float(metrics8["total_loss"]),
        rtol=1e-5,
    )
    p1 = jax.tree_util.tree_leaves(state1.params)
    p8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )

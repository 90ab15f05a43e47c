"""Tensor-parallel correctness: a DETR train step over a (data=2, model=4)
mesh with transformer activation sharding must match the single-device step
bit-for-bit within float tolerance (GSPMD inserts the collectives; the
"model" axis only changes WHERE the FFN matmuls run, never their values)."""
import jax
import numpy as np

from basedet_tpu.configs import DETRConfig
from basedet_tpu.engine.train_state import TrainState, make_train_step
from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch, tp_context
from basedet_tpu.utils.dummy import DummyLoader


def _setup():
    from tests.tiny import shrink

    cfg = shrink(DETRConfig())
    cfg.MODEL.BACKBONE.NAME = "resnet10"
    cfg.MODEL.BATCHSIZE = 1
    cfg.MODEL.TRANSFORMER.NUM_ENCODERS = 1
    cfg.MODEL.TRANSFORMER.NUM_DECODERS = 1
    cfg.MODEL.NUM_QUERIES = 8
    cfg.DATA.MAX_INSTANCES = 4
    cfg.SOLVER.WARM_ITERS = 0
    cfg.SOLVER.NUM_IMAGE_PER_EPOCH = 64
    model = cfg.build_model()
    from basedet_tpu.utils import registers
    solver = registers.solvers.get(cfg.SOLVER.BUILDER_NAME).build(cfg, world_size=1)
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(64, 64))
    batch = DummyLoader(
        batch_size=2, image_size=(64, 64), max_instances=4
    ).make_batch()
    return cfg, model, solver, variables, batch


def test_tp_step_matches_single_device():
    cfg, model, solver, variables, batch = _setup()
    step = make_train_step(model, solver, cfg)

    dev0 = jax.devices()[0]
    state1 = jax.device_put(TrainState.create(variables, solver, ema=False), dev0)
    state1, metrics1 = jax.jit(step)(state1, jax.device_put(batch, dev0))

    mesh = make_mesh((("data", 2), ("model", 4)))
    state_tp = replicate_state(
        TrainState.create(variables, solver, ema=False), mesh
    )
    batch_tp = shard_batch(dict(batch), mesh)
    with tp_context(mesh):
        state_tp, metrics_tp = jax.jit(step)(state_tp, batch_tp)

    np.testing.assert_allclose(
        float(metrics1["total_loss"]), float(metrics_tp["total_loss"]),
        rtol=1e-4,
    )
    p1 = jax.tree_util.tree_leaves(state1.params)
    p2 = jax.tree_util.tree_leaves(state_tp.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_tp_shard_is_noop_without_mesh():
    from basedet_tpu.parallel import tp_shard

    x = jax.numpy.ones((2, 3, 4))
    assert tp_shard(x, ("data", None, "model")) is x

"""Train state and the jitted train step.

TPU-native collapse of the reference's DetTrainer.train_one_iter +
Solver.minimize + ModelEMA.step (engine/trainer.py:74-101,
layers/common/ema.py:57-82): forward, loss, grad, optimizer update, and EMA
update compile into ONE XLA program. Gradient averaging across the
data-parallel mesh axis is inserted automatically by jit when the batch is
sharded and the state is replicated — the analogue of the reference's
``dist.make_allreduce_cb`` per-grad callbacks (solver/default_solver.py:61).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    model_state: Any = struct.field(default_factory=dict)  # batch_stats/frozen
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, variables, solver, ema: bool = False):
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=solver.init(params),
            model_state=model_state,
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
        )

    def variables(self, ema: bool = False):
        params = self.ema_params if (ema and self.ema_params is not None) else self.params
        return {"params": params, **self.model_state}


def ema_momentum(cfg_ema, max_iters: int) -> float:
    """pycls-style momentum from ALPHA (reference ema.py:10-29, magic 90000 =
    1x-coco total iters), unless MOMENTUM is given explicitly."""
    if cfg_ema.get("MOMENTUM", None):
        return float(cfg_ema.MOMENTUM)
    alpha = cfg_ema.get("ALPHA", 5e-4)
    period = cfg_ema.get("UPDATE_PERIOD", 1)
    return max(0.0, 1.0 - alpha * (90000 * period / max_iters))


def make_train_step(
    model,
    solver,
    cfg,
    axis_name: Optional[str] = None,
) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict]]:
    """Build the pure (state, batch) → (state, metrics) step function.

    ``axis_name``: if set, the step is written for shard_map/pmap semantics
    and averages grads with lax.pmean; if None (the default), rely on pjit
    auto-collectives with a batch-sharded input.
    """
    from basedet_tpu.layers.precision import configure_from_cfg

    configure_from_cfg(cfg)  # bf16 compute policy when TRAINER.AMP.ENABLE

    ema_cfg = cfg.TRAINER.EMA
    use_ema = bool(ema_cfg.get("ENABLE", False))
    momentum = ema_momentum(ema_cfg, solver.max_iters) if use_ema else 0.0
    burnin = ema_cfg.get("BURNIN_ITER", 0) if use_ema else 0
    update_period = ema_cfg.get("UPDATE_PERIOD", 1) if use_ema else 1

    base_rng = jax.random.PRNGKey(cfg.get("SEED", 42))

    use_remat = bool(cfg.TRAINER.get("REMAT", False))

    def train_step(state: TrainState, batch, rng=None):
        step_rng = (
            rng if rng is not None else jax.random.fold_in(base_rng, state.step)
        )

        def loss_fn(params):
            variables = {"params": params, **state.model_state}
            total, loss_dict, new_mutable = model.get_losses(
                variables, batch, step_rng
            )
            return total, (loss_dict, new_mutable)

        if use_remat:
            # rematerialization (analogue of the reference's DTR flag,
            # det_train.py:98-100). REMAT=True/"full": recompute the whole
            # forward. REMAT="selective": save only conv outputs
            # (checkpoint_name "conv_out" anchors in the blocks) and
            # recompute BN/activation tails — ~2/3 less activation memory
            # for a few % extra FLOPs, raising the batch-size ceiling.
            if str(cfg.TRAINER.get("REMAT")).lower() == "selective":
                loss_fn = jax.checkpoint(
                    loss_fn,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "conv_out"
                    ),
                )
            else:
                loss_fn = jax.checkpoint(loss_fn)

        (_, (loss_dict, new_mutable)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss_dict = jax.lax.pmean(loss_dict, axis_name)

        updates, new_opt_state = solver.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        # structural guard: cfg may enable EMA while the state was created
        # without an EMA tree (ema=False) — track nothing in that case
        if use_ema and state.ema_params is not None:
            step = state.step
            # before burnin, track params exactly (m=0); after, EMA with
            # momentum every update_period steps (reference ema.py:57-69)
            m = jnp.where(step < burnin, 0.0, momentum)
            do_update = (step % update_period == 0) | (step <= burnin)
            m = jnp.where(do_update, m, 1.0)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * m + p * (1.0 - m), state.ema_params, new_params
            )

        new_model_state = {**state.model_state, **new_mutable}
        metrics = dict(loss_dict)
        metrics["lr"] = solver.lr_schedule(state.step)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            model_state=new_model_state,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step


def jit_train_step(train_step):
    return jax.jit(train_step, donate_argnums=(0,))

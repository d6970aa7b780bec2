"""Sharded multi-chip training steps (pjit over a data × model mesh).

One compiled program per step: on-device data generation (batch sharded over
``data``), a vmapped grid of models (sharded over ``model``), per-model loss
over the full batch, gradient reduction over the data axis (XLA inserts the
``psum`` over ICI from the sharding annotations), and an AdamW update of the
sharded optimizer state.
"""

from __future__ import annotations

import functools

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moleculardiffusion_mivit_tpu.config import TrainConfig
from moleculardiffusion_mivit_tpu.train.grid import ModelGrid
from moleculardiffusion_mivit_tpu.train.loop import _loss, _set_lr, make_optimizer


def make_sharded_grid_step(
    model,
    train_cfg: TrainConfig,
    mesh: Mesh,
    with_features: bool = False,
):
    """Build ``step(grid, videos, labels, lr) -> (grid, losses)`` where
    ``videos (M, N, F, S, S)`` is sharded P('model', 'data') and the grid
    state P('model'). Each model takes one full-batch AdamW step on its own
    data slice; the mean over the batch axis becomes a cross-chip psum."""
    tx = make_optimizer(train_cfg)
    grid_shard = NamedSharding(mesh, P("model"))
    data_shard = NamedSharding(mesh, P("model", "data"))
    lr_shard = NamedSharding(mesh, P())

    def loss_one(params, batch_stats, videos, labels):
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out, mutated = model.apply(variables, videos, train=True, mutable=mutable)
        if labels.ndim == 2 and out.ndim == 3:
            labels = labels[..., None]
        return _loss(out, labels, train_cfg.loss), mutated.get("batch_stats", batch_stats)

    def step_one(params, batch_stats, opt_state, videos, labels, lr):
        opt_state = _set_lr(opt_state, lr)
        (loss, new_bstats), grads = jax.value_and_grad(loss_one, has_aux=True)(
            params, batch_stats, videos, labels
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bstats, new_opt, loss

    @functools.partial(
        jax.jit,
        in_shardings=(grid_shard, data_shard, data_shard, lr_shard),
        out_shardings=(grid_shard, grid_shard),
    )
    def step(grid: ModelGrid, videos, labels, lr):
        params, bstats, opt, losses = jax.vmap(
            step_one, in_axes=(0, 0, 0, 0, 0, None)
        )(grid.params, grid.batch_stats, grid.opt_state, videos, labels, lr)
        return ModelGrid(params, bstats, opt), losses

    return step

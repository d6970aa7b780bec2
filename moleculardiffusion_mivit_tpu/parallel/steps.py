"""Sharded multi-chip training programs (pjit over a data × model mesh).

The reference has no distributed backend at all (single process/GPU,
SURVEY.md §5); here its two scalable axes — the batch of generated sequences
and the grid of independent small models — become mesh axes. Everything is
ONE compiled program per cycle: on-device data generation (batch sharded over
``data``), a vmapped grid of models (sharded over ``model``), the per-epoch
minibatch scan with dropout rngs and optional 25-dim feature fusion (the
ImagesFeatures flagship, trainSettingsImagesFeatures.py:119-168), and AdamW
updates of the sharded optimizer state. Gradient/loss means over the sharded
batch axis become ``psum``s over ICI inserted by XLA from the sharding
annotations — no hand-written collectives.

Full fidelity with the single-device path is by construction: these are jits
of the *same* unjitted closures (``train.grid.make_grid_impls``) that
``train.grid.make_grid_train_fns`` jits without shardings.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moleculardiffusion_mivit_tpu.config import TrainConfig
from moleculardiffusion_mivit_tpu.train.grid import make_grid_impls


def _shardings(mesh: Mesh):
    grid_s = NamedSharding(mesh, P("model"))
    data_s = NamedSharding(mesh, P("model", "data"))
    rep_s = NamedSharding(mesh, P())
    return grid_s, data_s, rep_s


def grid_batch_constraint(mesh: Mesh):
    """``constrain_batch`` hook for grid impls: anchor each step's STACKED
    gathered minibatch ``(M, B, ...)`` to ``P('model', 'data')``. Without
    this the partitioner resolves the dynamic permutation gather by
    replicating the minibatch across the 'data' axis and runs each model's
    per-step compute redundantly on every device of its data column
    (verified on compiled HLO) — the constraint keeps per-step compute
    distributed over the whole mesh. See ``train.grid.make_grid_impls``."""
    data_s = NamedSharding(mesh, P("model", "data"))

    def constrain(bv, by, bf):
        c = lambda x: None if x is None else jax.lax.with_sharding_constraint(x, data_s)
        return c(bv), c(by), c(bf)

    return constrain


def dp_batch_constraint(mesh: Mesh, stacked: bool = False):
    """``constrain_batch`` hook for pure-DP (single-model / stacked-pair)
    arms: batch axis over the WHOLE mesh, everything else replicated.
    ``stacked=True`` for activation-pair stacks whose minibatch carries a
    leading replicated member axis ``(M, B, ...)``."""
    spec = (None, tuple(mesh.axis_names)) if stacked else (tuple(mesh.axis_names),)
    batch_s = NamedSharding(mesh, P(*spec))

    def constrain(bv, by, bf):
        c = lambda x: None if x is None else jax.lax.with_sharding_constraint(x, batch_s)
        return c(bv), c(by), c(bf)

    return constrain


def make_sharded_grid_fns(
    model,
    train_cfg: TrainConfig,
    mesh: Mesh,
    with_features: bool = False,
):
    """Sharded ``(init_grid, train_cycle, evaluate)`` for a model grid.

    Signatures match ``train.grid.make_grid_train_fns`` exactly:

    - ``train_cycle(grid, videos, labels, features, key, lr, batch_size)``
      with ``videos (M, N, F, S, S)`` / ``labels (M, N, k)`` / optional
      ``features (M, N, 25)`` sharded ``P('model', 'data')`` and the stacked
      grid state ``P('model')``. One epoch: shuffled minibatch scan, dropout
      rngs, per-model AdamW with injected LR.
    - ``evaluate(grid, videos, features=None)`` → rescaled predictions,
      born sharded ``P('model', 'data')``.
    """
    impls = make_grid_impls(
        model, train_cfg, with_features, constrain_batch=grid_batch_constraint(mesh)
    )
    init_grid, cycle_impl, eval_impl = impls.init_grid, impls.train_cycle, impls.evaluate
    grid_s, data_s, rep_s = _shardings(mesh)

    train_cycle = jax.jit(
        cycle_impl,
        static_argnames=("batch_size",),
        donate_argnums=(0,),
        # (grid, videos, labels, features, key, lr); features=None is an
        # empty pytree, so the data sharding prefix is vacuous there.
        in_shardings=(grid_s, data_s, data_s, data_s, rep_s, rep_s),
        out_shardings=(grid_s, grid_s),
    )
    eval_jit = jax.jit(
        lambda grid, videos, features: eval_impl(grid, videos, features),
        in_shardings=(grid_s, data_s, data_s),
        out_shardings=data_s,
    )

    def evaluate(grid, videos, features=None):
        return eval_jit(grid, videos, features)

    return init_grid, train_cycle, evaluate


def make_sharded_cycle_program(
    model,
    train_cfg: TrainConfig,
    mesh: Mesh,
    data_fn,
    with_features: bool = False,
):
    """ONE compiled program: key → trajectories → frames → epoch → psum.

    ``data_fn(key) -> (videos (M, N, F, S, S), labels (M, N, k),
    features (M, N, 25) | None)`` is traced *inside* the jit and its outputs
    constrained to ``P('model', 'data')`` — generation itself is partitioned
    across the mesh (JAX's threefry is partitionable, so each data shard
    draws only its own random slice; nothing is generated on the host and
    nothing is resharded after the fact).

    Returns ``cycle(grid, key, lr, batch_size) -> (grid, losses)`` with the
    grid state sharded ``P('model')`` throughout.
    """
    cycle_impl = make_grid_impls(
        model, train_cfg, with_features, constrain_batch=grid_batch_constraint(mesh)
    ).train_cycle
    grid_s, data_s, rep_s = _shardings(mesh)

    def constrain(x):
        return None if x is None else jax.lax.with_sharding_constraint(x, data_s)

    def cycle(grid, key, lr, batch_size: int):
        k_gen, k_train = jax.random.split(key)
        videos, labels, features = data_fn(k_gen)
        videos, labels = constrain(videos), constrain(labels)
        features = constrain(features) if with_features else None
        return cycle_impl(grid, videos, labels, features, k_train, lr, batch_size)

    return jax.jit(
        cycle,
        static_argnames=("batch_size",),
        donate_argnums=(0,),
        in_shardings=(grid_s, rep_s, rep_s),
        out_shardings=(grid_s, grid_s),
    )


def make_sharded_grid_step(
    model,
    train_cfg: TrainConfig,
    mesh: Mesh,
    with_features: bool = False,
):
    """One full-batch AdamW step per model (compat wrapper).

    ``step(grid, videos, labels, lr) -> (grid, losses)`` — the whole batch is
    one minibatch of the full-fidelity epoch in ``make_sharded_grid_fns``.
    """
    _, train_cycle, _ = make_sharded_grid_fns(model, train_cfg, mesh, with_features)

    def step(grid, videos, labels, lr, features=None, key=None):
        if key is None:
            key = jax.random.key(0)
        n = videos.shape[1]
        return train_cycle(grid, videos, labels, features, key, lr, n)

    return step

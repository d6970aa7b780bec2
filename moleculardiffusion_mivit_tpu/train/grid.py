"""Vmapped model grids: train many small homogeneous models as one program.

The reference trains its experiment grids sequentially in Python — 60 models
for PSFNoise (5 PSF × 6 noise × {transformer, resnet},
Experiments/PSFNoise/trainSettingsPSFNoise.py:90-125), 12 for Framerate, 14
for Denoising — each a separate torch module looped over per cycle. Each
model is tiny (~0.2-0.8M params, ≤61 tokens), far below what fills an MXU.

Here a homogeneous grid becomes a *stacked-parameter axis*: ``vmap`` over the
model axis of the single-model epoch turns the whole grid into one XLA
program whose batched matmuls actually saturate the hardware, and the model
axis shards across TPU devices via ``jax.sharding`` (see ``parallel.mesh``).
BatchNorm statistics ride along the vmapped axis as ordinary stacked pytree
leaves.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from moleculardiffusion_mivit_tpu.config import TrainConfig
from moleculardiffusion_mivit_tpu.models import init_model
from moleculardiffusion_mivit_tpu.train.loop import (
    TrainState,
    _cast_for_compute,
    _loss,
    _set_lr,
    make_optimizer,
)


class ModelGrid(struct.PyTreeNode):
    """Stacked train state for ``n_models`` copies of one architecture."""

    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def n_models(self) -> int:
        return jax.tree.leaves(self.params)[0].shape[0]


class GridImpls(NamedTuple):
    """Unjitted closures from ``make_grid_impls``.

    ``train_step(grid, videos, labels, features, idx, drop_keys, lr)`` is the
    single-minibatch update for the WHOLE stack (``idx (M, B)`` per-model
    batch indices, ``drop_keys (M,)``), exposed so the experiment engine can
    merge several arms' epochs into one ``lax.scan``. ``make_perms`` derives
    the per-model ``(M, steps, B)`` permutations and dropout keys exactly as
    ``train_cycle`` would, so merged and unmerged execution match bit-for-bit.
    """

    init_grid: Callable
    train_cycle: Callable
    evaluate: Callable
    train_step: Callable
    make_perms: Callable


def make_grid_impls(
    model,
    train_cfg: TrainConfig,
    with_features: bool = False,
    constrain_batch=None,
):
    """Build UNJITTED ``(init_grid, train_cycle, evaluate)`` for a vmapped grid.

    Data layout is model-major: ``videos (M, N, F, S, S)``,
    ``labels (M, N, k)`` (tile shared labels across M). Each model trains on
    its own slice — exactly the reference's ``make_prediction`` dispatch that
    feeds grid cell (psf, noise) to model ``tr_{psf}_{noise}``
    (trainSettingsPSFNoise.py:164-172) — but all models step together.

    The closures are returned unjitted so the single-device path
    (``make_grid_train_fns``) and the sharded multi-chip path
    (``parallel.steps``) jit the *same trace* — sharded-matches-unsharded
    holds by construction, modulo cross-shard reduction order.

    ``constrain_batch(bv, by, bf) -> (bv, by, bf)`` (optional, mesh paths):
    re-anchors the STACKED gathered minibatch ``(M, B, ...)`` to its mesh
    layout before each grad step. Without it the partitioner materializes
    each step's minibatch replicated across the 'data' axis and runs the
    per-model compute redundantly on every data-row device (verified on
    compiled HLO; see ``loop.make_train_impls``). When set, ``train_cycle``
    switches from vmap-of-scan to the equivalent scan-of-vmap layout (the
    same step order the merged-scan path uses — ``make_perms`` +
    ``train_step`` reproduce the vmap-of-scan updates bit-for-bit) so the
    constraint can apply to the stacked batch between gather and compute.
    """
    tx = make_optimizer(train_cfg)

    def init_grid(key, n_models: int, example_videos, example_features=None) -> ModelGrid:
        def init_one(k):
            args = (
                (example_videos, example_features)
                if with_features
                else (example_videos,)
            )
            params, bstats = init_model(model, k, *args)
            return params, bstats, tx.init(params)

        keys = jax.random.split(key, n_models)
        params, bstats, opt_state = jax.vmap(init_one)(keys)
        return ModelGrid(params, bstats, opt_state)

    def loss_fn(params, batch_stats, bv, bf, by, dropout_key):
        params, bv, bf = _cast_for_compute(train_cfg, params, bv, bf)
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        args = (bv, bf) if with_features else (bv,)
        out, mutated = model.apply(
            variables, *args, train=True, mutable=mutable, rngs={"dropout": dropout_key}
        )
        if by.ndim == 2 and out.ndim == 3:
            by = by[..., None]
        return _loss(out.astype(jnp.float32), by, train_cfg.loss), mutated.get(
            "batch_stats", batch_stats
        )

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _epoch_one(state: TrainState, videos, labels, features, key, lr, batch_size: int):
        n = videos.shape[0]
        steps = n // batch_size
        k_perm, k_drop = jax.random.split(key)
        perm = jax.random.permutation(k_perm, n)[: steps * batch_size].reshape(
            steps, batch_size
        )
        state = state.replace(opt_state=_set_lr(state.opt_state, lr))

        def body(st, idx):
            bv = videos[idx]
            by = labels[idx]
            bf = features[idx] if with_features else None
            dk = jax.random.fold_in(k_drop, idx[0])
            (loss, new_bstats), grads = grad_fn(st.params, st.batch_stats, bv, bf, by, dk)
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            return TrainState(optax.apply_updates(st.params, updates), new_bstats, new_opt), loss

        state, losses = jax.lax.scan(body, state, perm, unroll=train_cfg.scan_unroll)
        return state, jnp.mean(losses)

    def train_cycle(grid: ModelGrid, videos, labels, features, key, lr, batch_size: int):
        m = videos.shape[0]
        if constrain_batch is not None:
            # scan-of-vmap layout (the merged-scan step order, bit-identical
            # to the vmap-of-scan below) so the sharding constraint can bind
            # to the stacked (M, B, ...) minibatch each step
            n = videos.shape[1]
            perms, dks = make_perms(key, m, n, batch_size)
            xs = jnp.swapaxes(perms, 0, 1)  # (steps, M, B)

            def body(g, idx):
                return train_step(g, videos, labels, features, idx, dks, lr)

            grid, losses = jax.lax.scan(
                body, grid, xs, unroll=train_cfg.scan_unroll
            )
            return grid, jnp.mean(losses, axis=0)
        keys = jax.random.split(key, m)

        def one(params, bstats, opt, vids, labs, feats, k):
            st = TrainState(params, bstats, opt)
            st, loss = _epoch_one(st, vids, labs, feats, k, lr, batch_size)
            return st.params, st.batch_stats, st.opt_state, loss

        in_feats = features if with_features else None
        params, bstats, opt, losses = jax.vmap(
            one, in_axes=(0, 0, 0, 0, 0, 0 if with_features else None, 0)
        )(grid.params, grid.batch_stats, grid.opt_state, videos, labels, in_feats, keys)
        return ModelGrid(params, bstats, opt), losses

    def make_perms(key, m: int, n: int, batch_size: int):
        """Per-model permutations + dropout keys, derived exactly as
        ``train_cycle`` does (split(key, m) → per-model split): returns
        ``(perms (M, steps, B), drop_keys (M,))``."""
        steps = n // batch_size
        keys = jax.random.split(key, m)

        def one(k):
            k_perm, k_drop = jax.random.split(k)
            perm = jax.random.permutation(k_perm, n)[: steps * batch_size]
            return perm.reshape(steps, batch_size), k_drop

        return jax.vmap(one)(keys)

    def train_step(grid: ModelGrid, videos, labels, features, idx, drop_keys, lr):
        """One minibatch grad+update for every model in the stack.

        ``idx (M, B)`` gathers each model's batch from its own data slice;
        the per-model dropout key is ``fold_in(drop_keys[m], idx[m, 0])`` —
        identical to the scan body inside ``train_cycle``. The gather runs
        OUTSIDE the per-model vmap so ``constrain_batch`` (mesh paths) can
        bind the stacked ``(M, B, ...)`` minibatch to its sharding between
        gather and compute."""
        bv = jax.vmap(lambda v, ix: v[ix])(videos, idx)
        by = jax.vmap(lambda l, ix: l[ix])(labels, idx)
        bf = jax.vmap(lambda f, ix: f[ix])(features, idx) if with_features else None
        if constrain_batch is not None:
            bv, by, bf = constrain_batch(bv, by, bf)

        def one(params, bstats, opt, bv, by, bf, ix, dk):
            st = TrainState(params, bstats, _set_lr(opt, lr))
            dkey = jax.random.fold_in(dk, ix[0])
            (loss, new_bstats), grads = grad_fn(st.params, st.batch_stats, bv, bf, by, dkey)
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            return optax.apply_updates(st.params, updates), new_bstats, new_opt, loss

        params, bstats, opt, losses = jax.vmap(
            one, in_axes=(0, 0, 0, 0, 0, 0 if with_features else None, 0, 0)
        )(
            grid.params,
            grid.batch_stats,
            grid.opt_state,
            bv,
            by,
            bf,
            idx,
            drop_keys,
        )
        return ModelGrid(params, bstats, opt), losses

    def evaluate(grid: ModelGrid, videos, features=None):
        """videos (M, N, F, S, S) → rescaled predictions (M, N, ...)."""

        def one(params, bstats, vids, feats):
            variables = {"params": params}
            if bstats:
                variables["batch_stats"] = bstats
            args = (vids, feats) if with_features else (vids,)
            return model.apply(variables, *args, train=False)

        out = jax.vmap(one, in_axes=(0, 0, 0, 0 if with_features else None))(
            grid.params, grid.batch_stats, videos, features if with_features else None
        )
        return out * train_cfg.d_max_normalization

    return GridImpls(init_grid, train_cycle, evaluate, train_step, make_perms)


def make_grid_train_fns(model, train_cfg: TrainConfig, with_features: bool = False):
    """Single-device jitted ``(init_grid, train_cycle, evaluate)`` closures.

    See ``make_grid_impls`` for semantics; ``parallel.steps`` provides the
    multi-chip (pjit over a data × model mesh) jit of the same impls.
    """
    impls = make_grid_impls(model, train_cfg, with_features)
    train_cycle = jax.jit(
        impls.train_cycle, static_argnames=("batch_size",), donate_argnums=(0,)
    )
    return impls.init_grid, train_cycle, jax.jit(impls.evaluate)

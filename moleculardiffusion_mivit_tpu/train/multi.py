"""Fused multi-model cycle: one compiled program per training cycle for a
heterogeneous dict of models.

The reference trains its model dict sequentially in Python per cycle
(trainModels.py:207-223) — on our TPU tunnel every dispatch costs ~40 ms, so
a 7-model cycle (generate + 7 train epochs + 7 evals) spends more wall time
in dispatch than in compute. Here the WHOLE cycle is one jitted program:
on-device generation → ONE merged ``lax.scan`` whose body steps every model
on its own shuffled minibatch → optional validation MSEs — one dispatch and
one small fetch per cycle regardless of the number of models. Merging the
epochs into a single scan (rather than one scan per model) pays the loop
overhead once per step and lets XLA pack the models' independent tiny
matmuls, which individually underfill the MXU/VPU at these sizes.

Heterogeneous-model analog of ``train.grid`` (which vmaps homogeneous
stacks); built from the same unjitted ``make_train_impls`` closures.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.config import OpticsConfig, TrainConfig
from moleculardiffusion_mivit_tpu.train.loop import (
    _set_lr,
    generate_cycle_data,
    make_train_impls,
)


def make_multi_cycle(
    models: Dict[str, Any],
    train_cfg: TrainConfig,
    optics: OpticsConfig,
    with_features: bool = False,
    merge_scans: bool = False,
):
    """Build ``(init_states, cycle)`` for a dict of (possibly distinct)
    models sharing one generated dataset per cycle.

    ``init_states(key, example_videos, example_features=None)`` → dict of
    per-model ``TrainState``.

    ``cycle(states, key, lr, batch_size, val_videos=None, val_targets=None)``
    → ``(states, losses, val_mse)`` — generation happens INSIDE the program;
    if ``val_videos``/``val_targets`` are given every model is also evaluated
    in the same program and ``val_mse[name]`` is its mean squared error in
    physical D units. States are donated (buffers update in place).

    ``merge_scans``: step all models inside ONE ``lax.scan`` (loop overhead
    paid once per minibatch) vs one scan per model (XLA schedules the
    independent loops in sequence). Same update sequence either way — key
    derivation is identical. Default False: A/B on the real chip (7 baseline
    models, 256 seqs) measured merged at 430 ms vs unmerged 370 ms per cycle
    at batch 1 and ~equal (108 ms) at batch 16 — the larger merged-scan carry
    (every model's state through one loop) costs more than the per-step loop
    overhead it saves, and XLA does not cross-pack the arms' independent tiny
    matmuls.
    """
    impls = {
        name: make_train_impls(m, train_cfg, with_features) for name, m in models.items()
    }

    def init_states(key, example_videos, example_features=None):
        out = {}
        for i, name in enumerate(models):
            init_state = impls[name][0]
            args = (
                (example_videos, example_features) if with_features else (example_videos,)
            )
            out[name] = init_state(jax.random.fold_in(key, i), *args)
        return out

    names = list(models)

    @functools.partial(jax.jit, static_argnames=("batch_size",), donate_argnums=(0,))
    def cycle(
        states,
        key,
        lr,
        batch_size: int,
        val_videos=None,
        val_targets=None,
        val_features=None,
    ):
        k_gen, k_train = jax.random.split(key)
        videos, labels, feats = generate_cycle_data(k_gen, train_cfg, optics, with_features)
        n = videos.shape[0]
        steps = n // batch_size

        def val_pred(name, st):
            if with_features:
                return impls[name].evaluate(st, val_videos, val_features)
            return impls[name].evaluate(st, val_videos)

        if not merge_scans:
            new_states, losses, val_mse = {}, {}, {}
            for i, name in enumerate(names):
                st, loss = impls[name].train_cycle(
                    states[name],
                    videos,
                    labels,
                    feats,
                    jax.random.fold_in(k_train, i),
                    lr,
                    batch_size,
                )
                new_states[name] = st
                losses[name] = loss
                if val_videos is not None:
                    preds = val_pred(name, st)
                    val_mse[name] = jnp.mean((preds - val_targets) ** 2)
            return new_states, losses, val_mse

        # Per-model permutations + dropout keys, derived exactly as the
        # per-model ``train_cycle`` would (fold_in(k_train, i) → split), so
        # the merged scan reproduces the unmerged update sequence bit-for-bit.
        carry, perms, drop_keys = [], [], []
        for i, name in enumerate(names):
            k_perm, k_drop = jax.random.split(jax.random.fold_in(k_train, i))
            perm = jax.random.permutation(k_perm, n)[: steps * batch_size]
            perms.append(perm.reshape(steps, batch_size))
            drop_keys.append(k_drop)
            carry.append(
                states[name].replace(opt_state=_set_lr(states[name].opt_state, lr))
            )

        # ONE scan whose body steps EVERY model on its own minibatch: the
        # while-loop overhead is paid once per step instead of once per model
        # per step, and the models' tiny independent matmuls sit in one loop
        # body where XLA can pack them (each alone underfills the MXU/VPU).
        xs = jnp.stack(perms, axis=1)  # (steps, M, batch)

        def body(carry, idx_m):
            out, losses = [], []
            for i, name in enumerate(names):
                st, loss = impls[name].train_step(
                    carry[i], videos, labels, feats, idx_m[i], drop_keys[i]
                )
                out.append(st)
                losses.append(loss)
            return tuple(out), jnp.stack(losses)

        carry, step_losses = jax.lax.scan(body, tuple(carry), xs, unroll=train_cfg.scan_unroll)

        new_states = {name: carry[i] for i, name in enumerate(names)}
        losses = {name: jnp.mean(step_losses[:, i]) for i, name in enumerate(names)}
        val_mse = {}
        if val_videos is not None:
            for i, name in enumerate(names):
                preds = val_pred(name, new_states[name])
                val_mse[name] = jnp.mean((preds - val_targets) ** 2)
        return new_states, losses, val_mse

    return init_states, cycle

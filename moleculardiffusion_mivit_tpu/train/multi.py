"""Fused multi-model cycle: one compiled program per training cycle for a
heterogeneous dict of models.

The reference trains its model dict sequentially in Python per cycle
(trainModels.py:207-223) — on our TPU tunnel every dispatch costs ~40 ms, so
a 7-model cycle (generate + 7 train epochs + 7 evals) spends more wall time
in dispatch than in compute. Here the WHOLE cycle is one jitted program:
on-device generation → every model's full epoch (each an internal
``lax.scan``) → optional validation MSEs — one dispatch and one small fetch
per cycle regardless of the number of models.

Heterogeneous-model analog of ``train.grid`` (which vmaps homogeneous
stacks); built from the same unjitted ``make_train_impls`` closures.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.config import OpticsConfig, TrainConfig
from moleculardiffusion_mivit_tpu.train.loop import generate_cycle_data, make_train_impls


def make_multi_cycle(
    models: Dict[str, Any],
    train_cfg: TrainConfig,
    optics: OpticsConfig,
    with_features: bool = False,
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

    @functools.partial(jax.jit, static_argnames=("batch_size",), donate_argnums=(0,))
    def cycle(states, key, lr, batch_size: int, val_videos=None, val_targets=None):
        k_gen, k_train = jax.random.split(key)
        videos, labels, feats = generate_cycle_data(k_gen, train_cfg, optics, with_features)
        new_states, losses, val_mse = {}, {}, {}
        for i, name in enumerate(models):
            _, train_cycle, evaluate = impls[name]
            st, loss = train_cycle(
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
                preds = evaluate(st, val_videos)
                val_mse[name] = jnp.mean((preds - val_targets) ** 2)
        return new_states, losses, val_mse

    return init_states, cycle

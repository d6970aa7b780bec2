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
import optax

from moleculardiffusion_mivit_tpu.config import OpticsConfig, TrainConfig
from moleculardiffusion_mivit_tpu.models import init_model
from moleculardiffusion_mivit_tpu.train.loop import (
    TrainState,
    _cast_for_compute,
    _loss,
    _set_lr,
    generate_cycle_data,
    make_optimizer,
    make_train_impls,
)

# FF activations expressible as a leaky-relu slope: relu == slope 0 exactly
# (forward; the gradient differs only at inputs of exactly 0.0), leaky_relu
# == the reference's fixed 0.01 (models/layers.py:37).
SLOPE_BY_ACTIVATION = {"relu": 0.0, "leaky_relu": 0.01}

# Measured crossover for activation-pair stacking (TPU v5e, RESULTS.md):
# below this batch size the fused cycle is chain-latency-bound and stacking
# wins (1.64x at batch 1); at/above it the stacked batched GEMMs measured
# ~8% slower than separate chains. Single source for Experiment's per-regime
# gate and bench.py's --stack-pairs auto.
STACK_BELOW_BATCH = 32


def detect_activation_stacks(models: Dict[str, Any]):
    """Group GeneralTransformer entries that are identical up to the FF
    activation slope (the baseline's 3 × {relu, leaky_relu} pairs,
    trainSettings.py:83-134).

    Returns ``[(member_names, base_model, slopes), ...]`` for every group of
    ≥2 such models (insertion order preserved). Members of one group share
    parameter structure/init, so they can train as ONE vmapped stack whose
    per-member slope rides the vmapped axis as data — cutting the fused
    cycle's count of sequential scan chains, which the chain-count probe
    showed XLA schedules mostly serially (~30 ms marginal per chain at
    batch 1, RESULTS.md).
    """
    from moleculardiffusion_mivit_tpu.models import GeneralTransformer

    groups: Dict[tuple, list] = {}
    for name, m in models.items():
        if (
            type(m) is GeneralTransformer
            and not m.use_global_features
            and m.config.activation in SLOPE_BY_ACTIVATION
        ):
            sig = (
                m.embedding,
                m.fusion_type,
                m.global_feature_dim,
                m.head_hidden_dim,
                m.config.replace(activation="relu"),
            )
            groups.setdefault(sig, []).append(name)
    return [
        (
            g,
            models[g[0]],
            tuple(SLOPE_BY_ACTIVATION[models[n].config.activation] for n in g),
        )
        for g in groups.values()
        if len(g) >= 2
    ]


def _make_stacked_impls(model, slopes, train_cfg: TrainConfig, constrain_batch=None):
    """Unjitted closures training a width-M stack of one GeneralTransformer
    architecture whose members differ only in FF activation slope.

    Per-member keys are supplied by the caller (``fold_in(k_train, i)`` with
    each member's ORIGINAL model index), so a member's permutation, dropout
    and update sequence match what the unstacked per-model ``train_cycle``
    would produce — ``stack_pairs=True`` is an execution-layout change, not a
    semantics change (modulo batched-GEMM reduction order and the
    relu-gradient-at-exact-0 note in ``models/layers.py``).

    ``constrain_batch(bv, by, bf) -> (bv, by, bf)`` (optional, mesh paths):
    binds each step's stacked gathered minibatch ``(M, B, ...)`` to its mesh
    sharding between gather and compute (member axis replicated, batch
    data-parallel) — see ``train.loop.make_train_impls`` for why the
    partitioner otherwise replicates the per-step compute. When set,
    ``stack_cycle`` switches to the equivalent scan-of-vmap layout.
    """
    tx = make_optimizer(train_cfg)
    slopes = jnp.asarray(slopes, jnp.float32)

    def init_stack(keys, example_videos):
        def init_one(k):
            params, bstats = init_model(model, k, example_videos)
            return TrainState(params, bstats, tx.init(params))

        return jax.vmap(init_one)(keys)

    def loss_fn(params, batch_stats, slope, bv, by, dropout_key):
        params, bv, _ = _cast_for_compute(train_cfg, params, bv, None)
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out, mutated = model.apply(
            variables,
            bv,
            train=True,
            act_slope=slope,
            mutable=mutable,
            rngs={"dropout": dropout_key},
        )
        if by.ndim == 2 and out.ndim == 3:
            by = by[..., None]
        return _loss(out.astype(jnp.float32), by, train_cfg.loss), mutated.get(
            "batch_stats", batch_stats
        )

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def stack_cycle(sstate, videos, labels, keys, lr, batch_size: int):
        n = videos.shape[0]
        steps = n // batch_size

        if constrain_batch is not None:
            # scan-of-vmap layout: same per-member perms/dropout/update
            # sequence as the vmapped path below, but the stacked (M, B, ...)
            # minibatch exists OUTSIDE the member vmap so the sharding
            # constraint can bind it each step
            def mk(key):
                k_perm, k_drop = jax.random.split(key)
                perm = jax.random.permutation(k_perm, n)[: steps * batch_size]
                return perm.reshape(steps, batch_size), k_drop

            perms, dks = jax.vmap(mk)(keys)  # (M, steps, B), (M,)
            xs = jnp.swapaxes(perms, 0, 1)  # (steps, M, B)

            def body(carry, idx):
                bv = videos[idx]  # shared data + (M, B) indices -> (M, B, ...)
                by = labels[idx]
                bv, by, _ = constrain_batch(bv, by, None)

                def one_step(st, slope, ix, dk, bv, by):
                    st = st.replace(opt_state=_set_lr(st.opt_state, lr))
                    dkey = jax.random.fold_in(dk, ix[0])
                    (loss, new_bstats), grads = grad_fn(
                        st.params, st.batch_stats, slope, bv, by, dkey
                    )
                    updates, new_opt = tx.update(grads, st.opt_state, st.params)
                    return (
                        TrainState(
                            optax.apply_updates(st.params, updates), new_bstats, new_opt
                        ),
                        loss,
                    )

                return jax.vmap(one_step)(carry, slopes, idx, dks, bv, by)

            sstate, losses = jax.lax.scan(
                body, sstate, xs, unroll=train_cfg.scan_unroll
            )
            return sstate, jnp.mean(losses, axis=0)

        def one(st, slope, key):
            k_perm, k_drop = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n)[: steps * batch_size].reshape(
                steps, batch_size
            )
            st = st.replace(opt_state=_set_lr(st.opt_state, lr))

            def body(carry, idx):
                bv = videos[idx]
                by = labels[idx]
                dk = jax.random.fold_in(k_drop, idx[0])
                (loss, new_bstats), grads = grad_fn(
                    carry.params, carry.batch_stats, slope, bv, by, dk
                )
                updates, new_opt = tx.update(grads, carry.opt_state, carry.params)
                return (
                    TrainState(
                        optax.apply_updates(carry.params, updates), new_bstats, new_opt
                    ),
                    loss,
                )

            st, losses = jax.lax.scan(body, st, perm, unroll=train_cfg.scan_unroll)
            return st, jnp.mean(losses)

        return jax.vmap(one)(sstate, slopes, keys)

    def stack_evaluate(sstate, videos):
        def one(st, slope):
            variables = {"params": st.params}
            if st.batch_stats:
                variables["batch_stats"] = st.batch_stats
            return model.apply(variables, videos, train=False, act_slope=slope)

        out = jax.vmap(one, in_axes=(0, 0))(sstate, slopes)
        return out * train_cfg.d_max_normalization

    return init_stack, stack_cycle, stack_evaluate


def make_multi_cycle(
    models: Dict[str, Any],
    train_cfg: TrainConfig,
    optics: OpticsConfig,
    with_features: bool = False,
    merge_scans: bool = False,
    stack_pairs: bool = False,
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

    ``stack_pairs``: vmap-stack groups of GeneralTransformers identical up to
    FF activation slope (``detect_activation_stacks``) into ONE scan chain
    per group — the chain-count probe showed the per-model chains execute
    mostly serially on a TensorCore, so fewer/wider chains shorten the
    latency-bound batch-1 cycle (~210 → ~120 ms for the 7 baseline models at
    unroll 1, RESULTS.md). Per-member init keys, permutations and dropout
    keys are derived with each member's ORIGINAL model index, so stacked and
    unstacked runs produce the same update sequences; losses and ``val_mse``
    stay keyed by original model name, but the *states* dict keys stacked
    groups as ``"stack:<name1>+<name2>"`` holding member-stacked
    ``TrainState`` leaves. Video-only, unmerged path only (ignored under
    ``with_features`` / ``merge_scans``).
    """
    init_states, cycle_impl = _build_multi_cycle(
        models, train_cfg, optics, with_features, merge_scans, stack_pairs
    )
    return init_states, jax.jit(
        cycle_impl, static_argnames=("batch_size",), donate_argnums=(0,)
    )


def make_scanned_multi_cycle(
    models: Dict[str, Any],
    train_cfg: TrainConfig,
    optics: OpticsConfig,
    with_features: bool = False,
    merge_scans: bool = False,
    stack_pairs: bool = False,
):
    """``make_multi_cycle`` with K cycles fused into ONE dispatch.

    Returns ``(init_states, cycles)`` where
    ``cycles(states, keys (K,), lrs (K,), batch_size, val_videos=None,
    val_targets=None, val_features=None)`` runs K full cycles (generation +
    every model's epoch + optional validation) as a single compiled program:
    a ``lax.scan`` over per-cycle ``(key, lr)`` whose body is the ordinary
    fused cycle. The body is traced ONCE, so compile time stays that of one
    cycle while host↔device round-trips drop from K to 1. Measured on the
    v5e tunnel this is ~neutral for throughput (1668 vs 1662 seq/s at
    batch 1, RESULTS.md): JAX's async dispatch queue already pipelines
    per-cycle launches when nothing is fetched between them. It remains the
    right shape for drivers that DO sync per dispatch (per-block metric
    fetches, hosts with slow launch paths) and as the scan-over-cycles
    building block for whole-run-on-device protocols.

    Per-cycle losses/val-MSEs come back stacked along a leading (K,) axis, so
    history stays complete. Batch size is static: one compiled program per
    batch regime, exactly like the per-cycle variant. Each distinct K also
    compiles its own program — callers should chunk a run into a fixed K and
    a remainder, not scan a different K every call.
    """
    init_states, cycle_impl = _build_multi_cycle(
        models, train_cfg, optics, with_features, merge_scans, stack_pairs
    )

    @functools.partial(jax.jit, static_argnames=("batch_size",), donate_argnums=(0,))
    def cycles(
        states,
        keys,
        lrs,
        batch_size: int,
        val_videos=None,
        val_targets=None,
        val_features=None,
    ):
        def body(st, x):
            k, lr = x
            st, losses, val_mse = cycle_impl(
                st, k, lr, batch_size, val_videos, val_targets, val_features
            )
            return st, (losses, val_mse)

        states, (losses, val_mse) = jax.lax.scan(body, states, (keys, lrs))
        return states, losses, val_mse

    return init_states, cycles


def _build_multi_cycle(
    models: Dict[str, Any],
    train_cfg: TrainConfig,
    optics: OpticsConfig,
    with_features: bool,
    merge_scans: bool,
    stack_pairs: bool,
):
    """Shared builder: ``(init_states, UNJITTED cycle)`` — see
    ``make_multi_cycle`` for the cycle's semantics."""
    stacks = (
        detect_activation_stacks(models)
        if stack_pairs and not with_features and not merge_scans
        else []
    )
    names = list(models)
    stack_info = []  # (group_key, member_names, member_indices, closures)
    stacked_names = set()
    for member_names, base_model, slopes in stacks:
        group_key = "stack:" + "+".join(member_names)
        closures = _make_stacked_impls(base_model, slopes, train_cfg)
        stack_info.append(
            (group_key, member_names, [names.index(n) for n in member_names], closures)
        )
        stacked_names.update(member_names)

    impls = {
        name: make_train_impls(m, train_cfg, with_features)
        for name, m in models.items()
        if name not in stacked_names
    }

    def init_states(key, example_videos, example_features=None):
        out = {}
        for i, name in enumerate(models):
            if name in stacked_names:
                continue
            init_state = impls[name][0]
            args = (
                (example_videos, example_features) if with_features else (example_videos,)
            )
            out[name] = init_state(jax.random.fold_in(key, i), *args)
        for group_key, _, member_idx, (init_stack, _, _) in stack_info:
            keys = jnp.stack([jax.random.fold_in(key, i) for i in member_idx])
            out[group_key] = init_stack(keys, example_videos)
        return out

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
                if name in stacked_names:
                    continue
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
            for group_key, member_names, member_idx, closures in stack_info:
                _, stack_cycle, stack_evaluate = closures
                keys = jnp.stack([jax.random.fold_in(k_train, i) for i in member_idx])
                sstate, stack_losses = stack_cycle(
                    states[group_key], videos, labels, keys, lr, batch_size
                )
                new_states[group_key] = sstate
                if val_videos is not None:
                    preds = stack_evaluate(sstate, val_videos)
                for j, member in enumerate(member_names):
                    losses[member] = stack_losses[j]
                    if val_videos is not None:
                        val_mse[member] = jnp.mean((preds[j] - val_targets) ** 2)
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

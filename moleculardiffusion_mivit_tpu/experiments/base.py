"""Shared experiment engine.

Each reference experiment is a ``trainSettings*.py`` + ``trainModels*.py``
pair whose skeleton is identical (SURVEY.md §2.3): a dict of models, one
AdamW + StepLR per model, a cycle loop of generate→train-all→validate, and a
``make_prediction`` dispatch that slices each model's input out of the
generated tensor. Here that skeleton is one engine with two kinds of arms:

- ``ModelEntry``: one (possibly unique) architecture — compiled per model;
  also covers non-learned baselines (the MSD arms) and eval-time rotation
  TTA (trainSettingsImagesFeatures.py:255-300).
- ``GridArm``: a homogeneous stack of models (e.g. PSFNoise's 30 transformers
  over the 5×6 grid) trained as ONE vmapped program via ``train.grid`` —
  the reference trains these sequentially in Python (60 separate torch
  modules, trainModelsPSFNoise.py:177-196); here the whole stack steps
  together and can shard across a TPU mesh.

``generate_fn(key) -> data dict`` runs on device; slice functions implement
the reference's ``make_prediction`` input dispatch. History matches the
reference's ``validation_losses`` layout ({"val_<D>": [...], "val_avg":
[...]}, trainModels.py:50-52).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

import functools

from moleculardiffusion_mivit_tpu.config import OpticsConfig, TrainConfig
from moleculardiffusion_mivit_tpu.train.grid import make_grid_impls
from moleculardiffusion_mivit_tpu.train.loop import _set_lr, make_train_impls

# The reference trains its out-of-range tail class (D = 10.2) on HALF the
# per-class sequence count (trainModelsPSFNoise.py:45,128;
# trainModelsFramerate.py:45,127)
HALF_COUNT_D = 10.2


def class_sequence_counts(training_ds, sequences_per_d: int) -> Tuple[int, ...]:
    """Per-cycle sequence count for each D class — the single source of the
    half-count tail rule, shared by the discrete generators and by
    continuous-D curricula that must match the discrete per-cycle budget."""
    return tuple(
        sequences_per_d // 2 if ds[0] == HALF_COUNT_D else sequences_per_d
        for ds in training_ds
    )


# data dict -> (videos, features_or_None, labels)
SliceFn = Callable[[Dict[str, Any]], Tuple[jax.Array, Optional[jax.Array], jax.Array]]
# data dict -> model-major (videos (M,...), features_or_None (M,...), labels (M,...))
GridSliceFn = Callable[[Dict[str, Any]], Tuple[jax.Array, Optional[jax.Array], jax.Array]]


@dataclasses.dataclass
class ModelEntry:
    """One arm. ``model=None`` marks a non-learned baseline; then
    ``baseline_fn(data)`` returns predictions already in physical D units."""

    model: Any = None
    slice_fn: Optional[SliceFn] = None
    with_features: bool = False
    baseline_fn: Optional[Callable[[Dict[str, Any]], jax.Array]] = None
    tta_rotations: bool = False
    train_cfg: Optional[TrainConfig] = None  # per-arm override (rare)


@dataclasses.dataclass
class GridArm:
    """A homogeneous stack of ``len(names)`` models trained as one vmapped
    program. ``slice_fn`` returns model-major arrays aligned with ``names``."""

    model: Any
    names: List[str]
    slice_fn: GridSliceFn
    with_features: bool = False


def rotate_videos(videos: jax.Array, k: int) -> jax.Array:
    """Rotate (B, T, H, W) frames by k·90° in the image plane."""
    return jnp.rot90(videos, k=k, axes=(-2, -1))


def _data_parallel_fns(train_cycle_impl, eval_impl, mesh):
    """Pure data parallelism for a single-model arm: parameters replicated,
    batch sharded over every mesh device; XLA inserts the gradient-mean psum
    over ICI from the sharding annotations. Training batch sizes must divide
    the device count; evaluation accepts ANY batch — inputs are zero-padded
    to the next mesh multiple and the padding is sliced off the output, so
    arbitrary validation/in-order set sizes (e.g. 100 frozen sequences or
    the 700-sequence sweep on an 8-device mesh) evaluate correctly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)
    rep = NamedSharding(mesh, P())
    data_s = NamedSharding(mesh, P(axes))
    train_cycle = jax.jit(
        train_cycle_impl,
        static_argnames=("batch_size",),
        donate_argnums=(0,),
        in_shardings=(rep, data_s, data_s, data_s, rep, rep),
        out_shardings=(rep, rep),
    )
    def _eval_any(state, videos, features):
        # pad/shard/eval/slice in ONE compiled program (pad is static under
        # jit) — host-side padding cost 2-3 extra ~40 ms tunnel dispatches
        # per arm per evaluation
        n = videos.shape[0]
        pad = (-n) % mesh.size
        if pad:
            videos = jnp.concatenate(
                [videos, jnp.zeros((pad,) + videos.shape[1:], videos.dtype)], axis=0
            )
            if features is not None:
                features = jnp.concatenate(
                    [features, jnp.zeros((pad,) + features.shape[1:], features.dtype)],
                    axis=0,
                )
        videos = jax.lax.with_sharding_constraint(videos, data_s)
        if features is not None:
            features = jax.lax.with_sharding_constraint(features, data_s)
        return eval_impl(state, videos, features)[:n]

    ev_jit = jax.jit(_eval_any, out_shardings=rep)

    def evaluate(state, videos, features=None):
        return ev_jit(state, videos, features)

    return train_cycle, evaluate


class _AotEval:
    """Evaluation callable serving per-input-shape executables from the
    on-disk AOT cache (unmeshed runs; see ``Experiment.aot_cache``) —
    closing the remaining repeat-run compile cost after the fused cycle
    (measured: the 60-model grid's per-cycle chunked evaluations).

    Behaves exactly like the ``jax.jit(evaluate)`` it wraps; falls back to
    the jitted path on any cache trouble. Eval inputs are NOT donated, so a
    deserialized executable is validated by its first real call: a dispatch
    failure (poisoned blob — see ``Experiment._aot_exe``) is caught, the
    blob dropped, and the same call retried on a fresh compile."""

    def __init__(self, exp, arm_name: str, jitted):
        self._exp = exp
        self._tag = f"exp-{exp.name}-eval-{arm_name}"
        self._jitted = jitted
        self._exes: Dict[Any, Any] = {}

    def __call__(self, *args):
        if not self._exp._use_aot():
            return self._jitted(*args)
        key = (
            str(jax.tree.structure(args)),
            tuple(
                (tuple(l.shape), str(l.dtype))
                for l in jax.tree.leaves(args)
                if hasattr(l, "shape")
            ),
        )
        exe = self._exes.get(key)
        if exe is not None:
            return exe(*args)
        from moleculardiffusion_mivit_tpu.utils.aot_cache import (
            load_or_compile,
            lower_and_check,
        )

        try:
            lowered, entry = lower_and_check(self._jitted, *args, tag=self._tag)
            exe = load_or_compile(lowered, entry)
            out = exe(*args)
            if entry.get("source") == "cache":
                # force: async dispatch errors only materialize on fetch
                import numpy as np

                np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[:1])
        except Exception:
            try:
                if "entry" in locals() and entry.get("path"):
                    import os

                    if os.path.exists(entry["path"]):
                        os.remove(entry["path"])
                    entry["hit"] = False
                    exe = load_or_compile(lowered, entry)
                    out = exe(*args)
                else:
                    raise
            except Exception:  # anything else: permanent jitted fallback
                self._exes[key] = self._jitted
                return self._jitted(*args)
        self._exes[key] = exe
        return out


class Experiment:
    def __init__(
        self,
        name: str,
        train_cfg: TrainConfig,
        optics: OpticsConfig,
        arms: Dict[str, Union[ModelEntry, GridArm]],
        generate_fn: Callable[[jax.Array], Dict[str, Any]],
        val_data: Dict[float, Dict[str, Any]],
        in_order_data: Optional[Dict[str, Any]] = None,
    ):
        self.name = name
        self.train_cfg = train_cfg
        self.optics = optics
        self.arms = arms
        self.generate_fn = generate_fn
        self.val_data = val_data
        self.in_order_data = in_order_data
        self._fns: Dict[str, tuple] = {}
        self._impls: Dict[str, tuple] = {}
        self.states: Dict[str, Any] = {}
        self.history: Dict[str, Dict[str, list]] = {}
        self._built = False
        # train all learned arms + generation as ONE compiled program per
        # cycle (set False to dispatch per arm, e.g. while debugging one arm)
        self.fused_cycles = True
        # inside the fused program, step all arms in ONE merged lax.scan
        # (vs one scan per arm — same update sequence either way). Default
        # False: on-chip A/B showed the merged variant ~15% slower at batch 1
        # and neutral at batch 16 (see train.multi.make_multi_cycle docs).
        self.merge_scans = False
        # inside the fused program, train groups of single-model arms that
        # are identical up to the FF activation slope (the baseline's 3
        # relu/leaky pairs) as ONE vmapped stack per group — fewer sequential
        # scan chains shorten the latency-bound batch-1 cycle (953 → 1563
        # seq/s on v5e, train.multi.detect_activation_stacks). Regime-aware:
        # only batch regimes < 32 stack (the win is chain latency; at batch
        # 64 the stacked batched GEMMs measured ~8% slower). States stay
        # per-arm (stack/unstack happens inside the compiled cycle), so
        # evaluation, history, and checkpoints are unaffected. Update
        # sequences match the unstacked path (per-member keys derive from
        # each arm's original index); only batched-GEMM reduction order
        # differs. Composes with use_mesh (members' params replicate like
        # any single-model arm; the shared batch stays sharded over the
        # mesh) — ignored only under merge_scans. The crossover batch size
        # lives in train.multi.STACK_BELOW_BATCH (shared with bench.py's
        # --stack-pairs auto).
        self.stack_pairs = True
        # background-compile future batch regimes while training (see
        # _start_precompile); donation-safe because the warmer owns its
        # throwaway states
        self.precompile_schedule = True
        # serve/persist the fused cycle's per-batch-regime executables via
        # the on-disk AOT cache (utils.aot_cache): a repeat run — or a
        # schedule regime already seen by ANY prior run of this program —
        # deserializes in ~3 s instead of recompiling (72-930 s through the
        # axon tunnel, whose own compile cache does not persist). Unmeshed
        # fused path only (mesh shardings stay on the jitted path); any
        # cache failure falls back to jit permanently for the run. Default
        # ON for accelerator backends only: the CPU backend has a working
        # native persistent cache, and its AOT loader is machine-feature
        # picky — opt in explicitly there (tests do).
        self.aot_cache = jax.default_backend() != "cpu"
        self._aot_exes: Dict[int, Any] = {}
        self._mesh = None

    def use_mesh(self, mesh) -> "Experiment":
        """Shard this experiment over a data × model ``Mesh`` (call before
        ``build``): GridArm stacks shard their parameters/optimizer over the
        'model' axis and their batch over 'data' (``parallel.steps``);
        single-model arms replicate parameters and shard the batch over the
        whole mesh (pure data parallelism — the gradient mean becomes a psum
        over ICI). The fused single-dispatch cycle stays ON: the one compiled
        program per cycle carries per-arm sharding annotations (generation
        born sharded, grid states ``P('model')``, single-model states
        replicated), so mesh mode keeps the round-2 dispatch win.

        Schedule interaction: a minibatch gather from the batch-sharded data
        is resharded by XLA per step, so *any* batch size (including the
        schedule's early batch-1 cycles) is correct on a mesh; batch sizes
        that are a multiple of the data-axis size additionally avoid
        cross-shard traffic for single-model arms (see
        tests/test_parallel.py::test_experiment_mesh_fused_cycle_batch1).
        Evaluation-set sizes are unconstrained (DP eval pads to a mesh
        multiple internally), and activation-pair stacking stays active
        (``stack_pairs``; the pairs' chains fuse on the mesh exactly as
        single-chip — test_experiment_mesh_stack_pairs_matches_unstacked)."""
        assert not self._built, "use_mesh must be called before build()"
        self._mesh = mesh
        return self

    @property
    def model_names(self) -> List[str]:
        out = []
        for arm_name, arm in self.arms.items():
            out.extend(arm.names if isinstance(arm, GridArm) else [arm_name])
        return out

    # -- setup ----------------------------------------------------------
    def build(self, key: Optional[jax.Array] = None) -> None:
        key = key if key is not None else jax.random.key(self.train_cfg.seed)
        example = self.generate_fn(jax.random.fold_in(key, 0))
        for name in self.model_names:
            self.history[name] = {f"val_{d:g}": [] for d in self.val_data}
            self.history[name]["val_avg"] = []
        for i, (arm_name, arm) in enumerate(self.arms.items()):
            k = jax.random.fold_in(key, 1000 + i)
            if isinstance(arm, GridArm):
                videos, feats, _ = arm.slice_fn(example)
                # under a mesh, bake the per-step minibatch sharding
                # constraint into the impls (the fused cycle traces these
                # same closures, so the constraint rides along there too)
                grid_cb = None
                if self._mesh is not None:
                    from moleculardiffusion_mivit_tpu.parallel.steps import (
                        grid_batch_constraint,
                    )

                    grid_cb = grid_batch_constraint(self._mesh)
                impls = make_grid_impls(
                    arm.model, self.train_cfg, arm.with_features, constrain_batch=grid_cb
                )
                init_grid, train_cycle, evaluate = (
                    impls.init_grid,
                    impls.train_cycle,
                    impls.evaluate,
                )
                self._impls[arm_name] = (train_cycle, evaluate, impls)
                if self._mesh is not None:
                    from moleculardiffusion_mivit_tpu.parallel import (
                        make_sharded_grid_fns,
                        shard_grid,
                    )

                    _, sh_cycle, sh_eval = make_sharded_grid_fns(
                        arm.model, self.train_cfg, self._mesh, arm.with_features
                    )
                    self._fns[arm_name] = (sh_cycle, sh_eval)
                else:
                    self._fns[arm_name] = (
                        jax.jit(
                            train_cycle,
                            static_argnames=("batch_size",),
                            donate_argnums=(0,),
                        ),
                        _AotEval(self, arm_name, jax.jit(evaluate)),
                    )
                self.states[arm_name] = init_grid(
                    k,
                    len(arm.names),
                    videos[0, :1],
                    feats[0, :1] if arm.with_features else None,
                )
                if self._mesh is not None:
                    self.states[arm_name] = shard_grid(self.states[arm_name], self._mesh)
            elif arm.model is not None:
                cfg = arm.train_cfg or self.train_cfg
                videos, feats, _ = arm.slice_fn(example)
                dp_cb = None
                if self._mesh is not None:
                    from moleculardiffusion_mivit_tpu.parallel.steps import (
                        dp_batch_constraint,
                    )

                    dp_cb = dp_batch_constraint(self._mesh)
                impls = make_train_impls(
                    arm.model, cfg, arm.with_features, constrain_batch=dp_cb
                )
                init_state, train_cycle, evaluate = (
                    impls.init_state,
                    impls.train_cycle,
                    impls.evaluate,
                )
                self._impls[arm_name] = (train_cycle, evaluate, impls)
                if self._mesh is not None:
                    self._fns[arm_name] = _data_parallel_fns(
                        train_cycle, evaluate, self._mesh
                    )
                else:
                    self._fns[arm_name] = (
                        jax.jit(
                            train_cycle,
                            static_argnames=("batch_size",),
                            donate_argnums=(0,),
                        ),
                        _AotEval(self, arm_name, jax.jit(evaluate)),
                    )
                self.states[arm_name] = init_state(
                    k, videos[:1], feats[:1] if arm.with_features else None
                )
        self._detect_stacks()
        self._built = True

    def _detect_stacks(self) -> None:
        """Group single-model arms trainable as one vmapped stack (see the
        ``stack_pairs`` flag): GeneralTransformers identical up to the FF
        activation slope, video-only, no per-arm TrainConfig override, and
        consuming the same slice of the generated data. Populates
        ``self._stack_groups`` with ``(member_names, member_arm_indices,
        stack_cycle)`` — indices are each arm's position in ``self.arms``,
        which is what the fused cycle folds into ``k_train``, so stacked
        members see the same permutation/dropout streams as unstacked.
        Mesh mode stacks too: members' states replicate exactly like any
        single-model arm, so the stacked layout only changes on-chip
        scheduling (fewer chains), not the sharding story."""
        self._stack_groups = []
        if not self.stack_pairs:
            return
        from moleculardiffusion_mivit_tpu.train.multi import (
            _make_stacked_impls,
            detect_activation_stacks,
        )

        arm_names = list(self.arms)
        eligible = {
            name: arm.model
            for name, arm in self.arms.items()
            if isinstance(arm, ModelEntry)
            and arm.model is not None
            and not arm.with_features
            and arm.train_cfg is None
        }
        for member_names, base_model, slopes in detect_activation_stacks(eligible):
            by_slice: Dict[int, list] = {}
            for n in member_names:
                by_slice.setdefault(id(self.arms[n].slice_fn), []).append(n)
            for sub in by_slice.values():
                if len(sub) < 2:
                    continue
                sub_slopes = tuple(slopes[member_names.index(n)] for n in sub)
                stack_cb = None
                if self._mesh is not None:
                    from moleculardiffusion_mivit_tpu.parallel.steps import (
                        dp_batch_constraint,
                    )

                    stack_cb = dp_batch_constraint(self._mesh, stacked=True)
                _, stack_cycle, _ = _make_stacked_impls(
                    base_model, sub_slopes, self.train_cfg, constrain_batch=stack_cb
                )
                self._stack_groups.append(
                    (sub, [arm_names.index(n) for n in sub], stack_cycle)
                )

    def _fused_cycle_fn(self):
        """ONE compiled program per training cycle: on-device generation +
        every learned arm's epoch, traced together (train.multi analog at the
        experiment level). Per ~40 ms tunnel dispatch this turns
        1 + n_learned_arms dispatches into one.

        With ``self.merge_scans`` (default False — see
        ``train.multi.make_multi_cycle`` for the on-chip A/B), arms sharing
        an epoch length are additionally merged into ONE ``lax.scan`` whose
        body steps every arm (single-model arms via ``TrainImpls.train_step``,
        vmapped grids via ``GridImpls.train_step``), paying the loop overhead
        once per minibatch instead of once per arm per minibatch. Permutation/
        dropout keys are derived exactly as the per-arm ``train_cycle`` would
        (fold_in(k_train, arm_index) → split), so merged and unmerged
        execution match bit-for-bit.

        In mesh mode (``use_mesh``) the same program is jitted with per-arm
        shardings: grid states/outputs ``P('model')``, single-model states
        replicated, and every arm's sliced data constrained to its mesh
        layout (``P('model','data')`` for grids, batch over the whole mesh
        for single models) — generation partitions backward from those
        constraints (threefry is partitionable), so data is born sharded
        inside the one compiled cycle.

        Timing note (hard-won): when benchmarking this program through the
        TPU tunnel, synchronize on a freshly computed scalar of the returned
        states (e.g. a parameter checksum). ``block_until_ready`` on the
        donated (input-aliased) state buffers alone can return before the
        enqueued executions actually finish, producing fake-fast readings
        (9 ms/cycle "measured" for a program whose true cost is ~330 ms)."""
        if getattr(self, "_fused_cycle", None) is None:
            mesh = self._mesh
            # detected at build(); empty under merge_scans or when no two
            # arms are stackable
            stack_groups = getattr(self, "_stack_groups", [])
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep_s = NamedSharding(mesh, P())
                grid_state_s = NamedSharding(mesh, P("model"))
                grid_data_s = NamedSharding(mesh, P("model", "data"))
                dp_data_s = NamedSharding(mesh, P(tuple(mesh.axis_names)))
                state_shardings = {
                    arm_name: grid_state_s if isinstance(arm, GridArm) else rep_s
                    for arm_name, arm in self.arms.items()
                    if isinstance(arm, GridArm) or arm.model is not None
                }
                jit_kwargs = dict(
                    in_shardings=(state_shardings, rep_s, rep_s, rep_s),
                    out_shardings=state_shardings,
                )
            else:
                jit_kwargs = {}

            def _constrain(x, s):
                if mesh is None or x is None:
                    return x
                return jax.lax.with_sharding_constraint(x, s)

            @functools.partial(
                jax.jit, static_argnames=("batch_size",), donate_argnums=(0,), **jit_kwargs
            )
            def fused(states, k_gen, k_train, lr, batch_size: int):
                import warnings

                data = self.generate_fn(k_gen)
                new_states = dict(states)
                groups: Dict[int, list] = {}
                for j, (arm_name, arm) in enumerate(self.arms.items()):
                    if isinstance(arm, ModelEntry) and arm.model is None:
                        continue
                    videos, feats, labels = arm.slice_fn(data)
                    if mesh is not None:
                        s = grid_data_s if isinstance(arm, GridArm) else dp_data_s
                        videos = _constrain(videos, s)
                        labels = _constrain(labels, s)
                        feats = _constrain(feats, s)
                    n = videos.shape[1] if isinstance(arm, GridArm) else videos.shape[0]
                    if n // batch_size == 0:
                        warnings.warn(
                            f"experiment '{self.name}', arm '{arm_name}': batch size "
                            f"{batch_size} exceeds the per-cycle dataset size {n}; the "
                            "arm takes ZERO optimizer steps this regime (history keeps "
                            "recording). Lower max_batch_size or raise sequences_per_d."
                        )
                    groups.setdefault(n // batch_size, []).append(
                        (j, arm_name, arm, videos, feats, labels)
                    )
                if not self.merge_scans:
                    # regime-aware: stacking wins while the cycle is
                    # chain-latency-bound (953 → 1563 seq/s at batch 1) but
                    # the stacked batched GEMMs measured ~8% slower at batch
                    # 64 (RESULTS.md). batch_size is a jit-static, so each
                    # regime's program branches for free.
                    from moleculardiffusion_mivit_tpu.train.multi import (
                        STACK_BELOW_BATCH,
                    )

                    active_stacks = (
                        stack_groups if batch_size < STACK_BELOW_BATCH else []
                    )
                    stacked_names = {n for g, _, _ in active_stacks for n in g}
                    for steps, items in groups.items():
                        for j, arm_name, arm, videos, feats, labels in items:
                            if arm_name in stacked_names:
                                continue
                            new_states[arm_name], _ = self._impls[arm_name][0](
                                states[arm_name],
                                videos,
                                labels,
                                feats,
                                jax.random.fold_in(k_train, j),
                                lr,
                                batch_size,
                            )
                    # activation-slope stacks: members train as ONE vmapped
                    # scan chain; states are stacked on entry and unstacked
                    # on exit, so outside this program the layout is per-arm.
                    # Under a mesh the shared batch keeps the single-model DP
                    # sharding; the member axis is unsharded (params replicate
                    # like any ModelEntry).
                    for member_names, member_js, stack_cycle in active_stacks:
                        videos, _, labels = self.arms[member_names[0]].slice_fn(data)
                        if mesh is not None:
                            videos = _constrain(videos, dp_data_s)
                            labels = _constrain(labels, dp_data_s)
                        sstate = jax.tree.map(
                            lambda *xs: jnp.stack(xs),
                            *[states[n] for n in member_names],
                        )
                        keys = jnp.stack(
                            [jax.random.fold_in(k_train, j) for j in member_js]
                        )
                        sstate, _ = stack_cycle(
                            sstate, videos, labels, keys, lr, batch_size
                        )
                        for i, n in enumerate(member_names):
                            new_states[n] = jax.tree.map(lambda x: x[i], sstate)
                    return new_states
                for steps, items in groups.items():
                    if steps == 0:
                        continue
                    carries, xs, steppers = [], [], []
                    for j, arm_name, arm, videos, feats, labels in items:
                        k_arm = jax.random.fold_in(k_train, j)
                        impls = self._impls[arm_name][2]
                        st = states[arm_name]
                        if isinstance(arm, GridArm):
                            perms, dks = impls.make_perms(
                                k_arm, videos.shape[0], videos.shape[1], batch_size
                            )
                            xs.append(jnp.swapaxes(perms, 0, 1))  # (steps, M, B)
                            carries.append(st)

                            def stepper(c, idx, _i=impls, _v=videos, _f=feats, _l=labels, _d=dks):
                                return _i.train_step(c, _v, _l, _f, idx, _d, lr)[0]

                        else:
                            k_perm, k_drop = jax.random.split(k_arm)
                            perm = jax.random.permutation(k_perm, videos.shape[0])
                            xs.append(perm[: steps * batch_size].reshape(steps, batch_size))
                            carries.append(
                                st.replace(opt_state=_set_lr(st.opt_state, lr))
                            )

                            def stepper(c, idx, _i=impls, _v=videos, _f=feats, _l=labels, _d=k_drop):
                                return _i.train_step(c, _v, _l, _f, idx, _d)[0]

                        steppers.append(stepper)

                    def body(carry, idx_tuple, _steppers=tuple(steppers)):
                        return (
                            tuple(s(c, i) for s, c, i in zip(_steppers, carry, idx_tuple)),
                            None,
                        )

                    carry, _ = jax.lax.scan(body, tuple(carries), tuple(xs))
                    for (j, arm_name, *_rest), c in zip(items, carry):
                        new_states[arm_name] = c
                return new_states

            self._fused_cycle = fused
        return self._fused_cycle

    def _use_aot(self) -> bool:
        return bool(self.aot_cache) and self._mesh is None and self.fused_cycles

    def _aot_exe(self, batch_size: int, example_states, key):
        """The fused cycle's AOT executable for one batch regime — served
        from the on-disk cache (~3 s deserialize) or compiled once and
        persisted. ``example_states`` provides lowering avals only (zeros
        from the precompile warmer work as well as live states); call the
        result with ``(states, k_gen, k_train, lr)`` — batch_size was baked
        in at lowering, and states donate exactly as on the jitted path.

        Deserialized executables are PROBED on throwaway zero states before
        use: a blob can deserialize yet fail at dispatch (observed on the
        CPU backend: "Function wrapped_subtract.1 not found"), and that
        error would otherwise surface asynchronously mid-training. A failed
        probe deletes the poisoned blob and compiles fresh (re-persisting),
        so the cache self-heals; the probe costs one dummy-cycle execution
        per regime per process."""
        import os

        import numpy as np

        exe = self._aot_exes.get(batch_size)
        if exe is not None:
            return exe
        from moleculardiffusion_mivit_tpu.utils.aot_cache import (
            load_or_compile,
            lower_and_check,
        )

        fused = self._fused_cycle_fn()
        lr = jnp.float32(self.train_cfg.lr)
        lowered, entry = lower_and_check(
            fused,
            example_states,
            key,
            key,
            lr,
            batch_size,
            tag=f"exp-{self.name}-b{batch_size}",
        )
        exe = load_or_compile(lowered, entry)
        if entry.get("source") == "cache":
            try:
                dummy = jax.tree.map(jnp.zeros_like, example_states)
                probe = exe(dummy, key, key, lr)
                # host-fetch: async dispatch errors only materialize here
                np.asarray(jax.tree.leaves(probe)[0]).ravel()[:1]
            except Exception:
                try:
                    if entry.get("path") and os.path.exists(entry["path"]):
                        os.remove(entry["path"])
                except OSError:
                    pass
                entry["hit"] = False
                exe = load_or_compile(lowered, entry)
        # benign race with the precompile thread: same key → same executable
        self._aot_exes.setdefault(batch_size, exe)
        return self._aot_exes[batch_size]

    # -- prediction (the make_prediction dispatch) -----------------------
    def _arm_of(self, model_name: str):
        for arm_name, arm in self.arms.items():
            if isinstance(arm, GridArm):
                if model_name in arm.names:
                    return arm_name, arm
            elif arm_name == model_name:
                return arm_name, arm
        raise KeyError(model_name)

    # Evaluation batches are chunked: a vmapped grid of M models evaluating N
    # sequences at once holds M×N sequences' worth of activations — the full
    # PSFNoise grid (30 models × 700 in-order sequences of 30 deep-ResNet
    # frames) exhausts HBM otherwise.
    eval_chunk: int = 64

    def _grid_predictions(self, arm_name: str, arm: GridArm, data) -> jax.Array:
        _, evaluate = self._fns[arm_name]
        videos, feats, _ = arm.slice_fn(data)
        n = videos.shape[1]
        if n <= self.eval_chunk:
            return evaluate(self.states[arm_name], videos, feats)
        chunks = []
        for start in range(0, n, self.eval_chunk):
            sl = slice(start, min(start + self.eval_chunk, n))
            chunks.append(
                evaluate(
                    self.states[arm_name],
                    videos[:, sl],
                    feats[:, sl] if feats is not None else None,
                )
            )
        return jnp.concatenate(chunks, axis=1)

    def predict(self, model_name: str, data: Dict[str, Any]) -> jax.Array:
        """Rescaled predictions in physical D units for one model arm."""
        arm_name, arm = self._arm_of(model_name)
        if isinstance(arm, GridArm):
            preds = self._grid_predictions(arm_name, arm, data)
            return preds[arm.names.index(model_name)]
        if arm.model is None:
            return arm.baseline_fn(data)
        _, evaluate = self._fns[arm_name]
        videos, feats, _ = arm.slice_fn(data)
        state = self.states[arm_name]

        def run(v):
            return evaluate(state, v, feats) if arm.with_features else evaluate(state, v)

        if arm.tta_rotations:
            return jnp.mean(jnp.stack([run(rotate_videos(videos, k)) for k in range(4)]), axis=0)
        return run(videos)

    # -- training -------------------------------------------------------
    def run(
        self,
        num_cycles: Optional[int] = None,
        callback: Optional[Callable[[int, Dict[str, float]], None]] = None,
        eval_every: int = 1,
        checkpoint_last: int = 0,
        checkpoint_dir: Optional[str] = None,
        start_cycle: int = 0,
    ):
        """Run ``num_cycles`` dataset-refresh cycles starting at
        ``start_cycle`` (resume support: the cycle index drives the adaptive
        batch-size and staircase-LR schedules and the per-cycle RNG keys)."""
        if not self._built:
            self.build()
        num_cycles = num_cycles if num_cycles is not None else self.train_cfg.num_cycles
        key = jax.random.key(self.train_cfg.seed + 1)

        warm_thread = None
        if self.fused_cycles and self.precompile_schedule:
            regimes = []
            seen = set()
            for c in range(start_cycle, start_cycle + num_cycles):
                b = self.train_cfg.batch_size_for_cycle(c)
                if b not in seen:
                    seen.add(b)
                    regimes.append(b)
            if len(regimes) > 1:
                warm_thread = self._start_precompile(regimes[1:])

        for cycle in range(start_cycle, start_cycle + num_cycles):
            k_cycle = jax.random.fold_in(key, cycle)
            k_gen, k_train = jax.random.split(k_cycle)
            bs = self.train_cfg.batch_size_for_cycle(cycle)
            lr = jnp.float32(self.train_cfg.lr_for_cycle(cycle))

            if self.fused_cycles:
                if self._use_aot():
                    try:
                        exe = self._aot_exe(bs, self.states, k_gen)
                    except Exception as e:  # caching must never break training
                        import warnings

                        warnings.warn(
                            f"AOT cycle cache disabled for this run "
                            f"({type(e).__name__}: {e}); falling back to jit"
                        )
                        self.aot_cache = False
                if self._use_aot():
                    self.states = exe(self.states, k_gen, k_train, lr)
                else:
                    self.states = self._fused_cycle_fn()(
                        self.states, k_gen, k_train, lr, bs
                    )
            else:
                data = self.generate_fn(k_gen)
                for j, (arm_name, arm) in enumerate(self.arms.items()):
                    if isinstance(arm, ModelEntry) and arm.model is None:
                        continue
                    train_cycle, _ = self._fns[arm_name]
                    videos, feats, labels = arm.slice_fn(data)
                    self.states[arm_name], _ = train_cycle(
                        self.states[arm_name],
                        videos,
                        labels,
                        feats,
                        jax.random.fold_in(k_train, j),
                        lr,
                        bs,
                    )

            if (cycle + 1) % eval_every == 0 or cycle == start_cycle + num_cycles - 1:
                cycle_avgs = self._evaluate_cycle()
                if callback:
                    callback(cycle, cycle_avgs)
            if (
                checkpoint_dir
                and checkpoint_last
                and (start_cycle + num_cycles) - cycle <= checkpoint_last
            ):
                from moleculardiffusion_mivit_tpu.utils.checkpoint import save_experiment

                save_experiment(self, f"{checkpoint_dir}/{self.name}_cycle{cycle}")
        if warm_thread is not None:
            warm_thread.join(timeout=0.1)  # normally long done; never block exit
        return self.states, self.history

    def _start_precompile(self, batch_sizes):
        """Speculatively compile the fused cycle for FUTURE batch regimes in
        a background thread while training runs the current one.

        The adaptive doubling schedule changes the static ``batch_size`` at
        fixed cycle boundaries; each change recompiles the fused program —
        ~50 s per regime through the TPU tunnel for the 7-model baseline
        (~190 s of a 250 s run), and the tunnel's persistent compilation
        cache does NOT function for the axon backend (verified: identical
        programs recompile in fresh processes). Compilation happens
        tunnel-side and overlaps with on-chip execution, so warming each
        future regime on throwaway zero states hides the stalls; the one
        dummy execution per regime interleaves ~a cycle's cost. If the main
        loop reaches a regime mid-compile it blocks on jax's in-progress
        compilation for that signature — never compiles twice."""
        import threading

        fused = self._fused_cycle_fn()
        dummy = jax.tree.map(jnp.zeros_like, self.states)
        lr = jnp.float32(self.train_cfg.lr)

        def warm():
            k = jax.random.key(0)
            if self._use_aot():
                # warm the AOT path instead: lower + (deserialize | compile
                # and persist) each future regime's executable — no dummy
                # execution needed, and cached regimes are ready in seconds
                for bs in batch_sizes:
                    try:
                        self._aot_exe(bs, dummy, k)
                    except Exception as e:
                        import warnings

                        warnings.warn(
                            f"AOT precompile for batch regime {bs} failed "
                            f"({type(e).__name__}: {e}); the main loop will "
                            "fall back when it reaches that regime"
                        )
                        return
                return
            states = dummy
            for bs in batch_sizes:
                try:
                    states = fused(states, k, k, lr, bs)
                except Exception as e:  # never take down training from the warmer
                    # but never die silently either: a broken warmer reinstates
                    # the ~190 s of recompile stalls it exists to hide.
                    import warnings

                    warnings.warn(
                        f"speculative precompile for batch regime {bs} failed "
                        f"({type(e).__name__}: {e}); the main loop will compile "
                        "it synchronously when the schedule reaches it"
                    )
                    return
            jax.block_until_ready(jax.tree.leaves(states))

        t = threading.Thread(target=warm, name="fused-cycle-precompile", daemon=True)
        t.start()
        return t

    def _combined_val(self):
        """Concatenate the per-D validation dicts into one batch so each arm
        evaluates in ONE device call per cycle (dispatch latency through the
        TPU tunnel dominates otherwise). Cached; returns
        ``(data dict, d_list, segment sizes)``."""
        if getattr(self, "_combined_val_cache", None) is None:
            import numpy as _np

            ds = list(self.val_data)
            first = self.val_data[ds[0]]
            sizes = [
                int(jax.tree.leaves(self.val_data[d]["videos"])[0].shape[0]) for d in ds
            ]
            combined = {}
            for k, v in first.items():
                if v is None or _np.ndim(v) == 0:
                    combined[k] = v
                else:
                    combined[k] = jnp.concatenate(
                        [jnp.asarray(self.val_data[d][k]) for d in ds], axis=0
                    )
            self._combined_val_cache = (combined, ds, sizes)
        return self._combined_val_cache

    def _evaluate_cycle(self) -> Dict[str, float]:
        """Per-cycle validation MSEs for every model.

        The per-D (pred − d)² means are reduced ON DEVICE and every arm's
        reductions are concatenated into ONE small vector fetched in a
        single transfer: per-arm ``np.asarray`` fetches serialize at the
        ~30-40 ms tunnel round-trip each (~200 ms/cycle for 7 arms), which
        dominated experiment wall-clock at eval_every=1. The reduction
        averages over ALL trailing axes, covering single predictions (N, 1)
        and sequence mode (N, T, 1)."""
        import numpy as np

        cycle_avgs: Dict[str, float] = {}
        combined, ds, sizes = self._combined_val()
        bounds = np.cumsum([0] + sizes)
        spans = [(int(bounds[di]), int(bounds[di + 1]), float(d)) for di, d in enumerate(ds)]

        # cache keyed on the span layout: a rebuilt/changed validation set
        # (different spans) gets a fresh jit instead of stale baked-in bounds
        spans_key = tuple(spans)
        if getattr(self, "_per_d_mse_key", None) != spans_key:

            def _per_d_mse(preds, batch_axis: int):
                out = []
                for b0, b1, d in spans:
                    seg = jax.lax.slice_in_dim(preds, b0, b1, axis=batch_axis)
                    out.append(
                        jnp.mean((seg - d) ** 2, axis=tuple(range(batch_axis, seg.ndim)))
                    )
                return jnp.stack(out, axis=-1)  # (n_d,) or (M, n_d)

            self._per_d_mse_jit = jax.jit(_per_d_mse, static_argnums=(1,))
            self._per_d_mse_key = spans_key
        per_d_mse = self._per_d_mse_jit

        # dispatch every arm's prediction + on-device reduction, then fetch
        # the concatenation of all reductions in ONE transfer
        pieces, layout = [], []
        for arm_name, arm in self.arms.items():
            if isinstance(arm, GridArm):
                preds = self._grid_predictions(arm_name, arm, combined)
                pieces.append(per_d_mse(jnp.asarray(preds), 1).reshape(-1))
                layout.append((arm_name, arm, len(arm.names)))
            else:
                preds = self.predict(arm_name, combined)
                pieces.append(per_d_mse(jnp.asarray(preds), 0))
                layout.append((arm_name, arm, 1))
        flat = np.asarray(jnp.concatenate(pieces))

        def record(mname, per_d):
            per_d = [float(x) for x in per_d]
            for d, mse in zip(ds, per_d):
                self.history[mname][f"val_{d:g}"].append(mse)
            avg = sum(per_d) / len(per_d)
            self.history[mname]["val_avg"].append(avg)
            cycle_avgs[mname] = avg

        off = 0
        n_d = len(ds)
        for arm_name, arm, n_models in layout:
            block = flat[off : off + n_models * n_d].reshape(n_models, n_d)
            off += n_models * n_d
            if isinstance(arm, GridArm):
                for mi, mname in enumerate(arm.names):
                    record(mname, block[mi])
            else:
                record(arm_name, block[0])
        return cycle_avgs

    # -- poster-style scoring --------------------------------------------
    def in_order_predictions(self, data: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Per-sequence predictions of every model on the in-order D sweep,
        reshaped ``(n_d, n_particles)`` in physical D units — the raw
        material of the analysis notebooks' prediction-vs-D curves and error
        violins (train_resultsImagesFeatures.ipynb cells 8-9). ``data``
        overrides the built sweep (e.g. a fresh render from
        ``in_order_data["re_render"]``)."""
        import numpy as np

        data = data if data is not None else self.in_order_data
        assert data is not None, "experiment has no in-order sweep"
        d_values = data["d_values"]
        n_d = len(d_values)
        out: Dict[str, Any] = {}
        for arm_name, arm in self.arms.items():
            if isinstance(arm, GridArm):
                # one (chunked) grid evaluation covers every member model
                preds = self._grid_predictions(arm_name, arm, data)
                for mi, mname in enumerate(arm.names):
                    out[mname] = np.asarray(jnp.reshape(preds[mi], (n_d, -1)))
            else:
                preds = self.predict(arm_name, data)
                out[arm_name] = np.asarray(jnp.reshape(preds, (n_d, -1)))
        return out

    def in_order_error_tables(self, n_renders: int = 1) -> Dict[str, Dict[str, float]]:
        """Evaluate every arm on the in-order D sweep and score it the poster
        way (mse of pred−true, std/4) — train_resultsPSFNoise.ipynb cell 10.

        ``n_renders > 1`` re-scores the identical trajectories under fresh
        render-noise draws (``in_order_data["re_render"]``) and augments each
        table with ``mse_render_mean`` / ``mse_render_std`` / ``mse_renders``
        — the render draw is the dominant noise on these scores (σ ≈ 0.011
        vs 0.002 training-seed σ on the reconciled suite,
        results/render_noise), so single-render records are ±0.01
        quantities. The base ``mse`` stays the first (protocol) render for
        backward comparability."""
        from moleculardiffusion_mivit_tpu.evaluation import error_table

        assert self.in_order_data is not None, "experiment has no in-order sweep"
        d_values = self.in_order_data["d_values"]
        tables = {
            name: error_table(preds, d_values)
            for name, preds in self.in_order_predictions().items()
        }
        if n_renders > 1:
            import numpy as np

            re_render = self.in_order_data.get("re_render")
            assert re_render is not None, (
                "this experiment's in-order sweep was pre-rendered and cannot "
                "be re-rendered (no 're_render' hook; build it via "
                "evaluation.build_in_order_data)"
            )
            per_arm = {name: [t["mse"]] for name, t in tables.items()}
            key = jax.random.key(self.train_cfg.seed + 424242)
            for r in range(n_renders - 1):
                data = re_render(jax.random.fold_in(key, r))
                for name, preds in self.in_order_predictions(data).items():
                    per_arm[name].append(float(error_table(preds, d_values)["mse"]))
            for name, mses in per_arm.items():
                tables[name]["mse_render_mean"] = float(np.mean(mses))
                tables[name]["mse_render_std"] = float(np.std(mses, ddof=1))
                tables[name]["mse_renders"] = [round(float(m), 5) for m in mses]
        return tables

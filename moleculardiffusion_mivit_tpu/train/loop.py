"""Cycle-based training loop, fully on device.

Reproduces the reference harness semantics (tests/train_tests/trainModels.py):
``num_cycles`` dataset-refresh cycles; each cycle generates fresh sequences
for every D class (64 per class by default), renders + normalizes them,
trains every model for one epoch over the shuffled set, steps a staircase LR
decay (StepLR(5, 0.9)), and evaluates on the frozen validation videos with
predictions rescaled by ``d_max_normalization``.

TPU-first differences (behavior-preserving):

- generation is a jitted on-device function of a PRNG key — no host numpy,
  no host→device copy per batch;
- the per-epoch minibatch loop is a ``lax.scan`` over a permuted index
  matrix, so one compiled program trains a whole epoch;
- the adaptive batch-size doubling (1→2→4→8→16 every 20 cycles,
  trainModels.py:102-108) triggers one recompile per distinct batch size
  (5 per run) instead of per-step Python dispatch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from moleculardiffusion_mivit_tpu.config import OpticsConfig, TrainConfig
from moleculardiffusion_mivit_tpu.models import init_model
from moleculardiffusion_mivit_tpu.sim import (
    normalize_images,
    single_state,
    trajectories_to_video,
)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any


class TrainImpls(NamedTuple):
    """Unjitted per-model closures from ``make_train_impls``.

    ``train_step`` is the single-minibatch grad+update (the body of
    ``train_cycle``'s scan), exposed so fused multi-model programs
    (``train.multi``) can merge every model's epoch into ONE scan.
    It assumes the learning rate was already injected into
    ``state.opt_state`` (see ``set_lr``).
    """

    init_state: Callable
    train_cycle: Callable
    evaluate: Callable
    train_step: Callable


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW with injectable LR, matching the reference's per-model
    ``optim.AdamW(lr)`` + ``StepLR(step_size=5, gamma=0.9)``
    (trainSettings.py:131-132). The staircase decay is applied by passing
    ``cfg.lr_for_cycle(cycle)`` into each cycle."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.lr, weight_decay=cfg.weight_decay
    )


def _set_lr(opt_state, lr):
    return opt_state._replace(hyperparams={**opt_state.hyperparams, "learning_rate": lr})


@functools.partial(jax.jit, static_argnames=("train_cfg", "optics", "with_features"))
def generate_cycle_data(
    key: jax.Array,
    train_cfg: TrainConfig,
    optics: OpticsConfig,
    with_features: bool = False,
):
    """One cycle's fresh dataset, entirely on device.

    Mirrors trainModels.py:111-154: per D class, ``single_state`` trajectories
    (already particle-major), divide by ``traj_div_factor``, render with
    per-frame centering, normalize against
    ``(bg_mean, bg_sigma, part_mean + bg_mean)``, labels divided by
    ``d_max_normalization`` (single D per sequence, or per-frame means of the
    sub-position labels in sequence mode).

    Returns ``(videos (N, F, S, S), labels (N, 1) or (N, F), features?)``.
    """
    p = train_cfg.n_pos_per_frame
    t = train_cfg.n_frames * p
    bg_mean, bg_sigma = optics.background_intensity
    part_mean = optics.particle_intensity[0]

    all_videos, all_labels, all_trajs = [], [], []
    for i, ds in enumerate(train_cfg.training_ds):
        k_sim, k_render = jax.random.split(jax.random.fold_in(key, i))
        trajs, labels = single_state(k_sim, train_cfg.sequences_per_d, t, Ds=tuple(ds))
        trajs = trajs / train_cfg.traj_div_factor
        videos = trajectories_to_video(k_render, trajs, p, train_cfg.center, optics)
        videos, _ = normalize_images(videos, bg_mean, bg_sigma, part_mean + bg_mean)
        all_videos.append(videos)
        all_trajs.append(trajs)
        all_labels.append(labels)

    videos = jnp.concatenate(all_videos, axis=0)
    labels = jnp.concatenate(all_labels, axis=0)
    d_per_step = labels[:, :, 1]
    if train_cfg.sequence_mode:
        # per-frame labels = mean of sub-position D labels (trainModels.py:134-135)
        y = d_per_step.reshape(d_per_step.shape[0], train_cfg.n_frames, p).mean(axis=2)
    else:
        y = d_per_step[:, :1]
    y = y / train_cfg.d_max_normalization

    if with_features:
        from moleculardiffusion_mivit_tpu.features import (
            compute_features_for_multiple_trajectories,
        )
        from moleculardiffusion_mivit_tpu.sim.trajectory import (
            average_trajectories_frames,
        )

        trajs = jnp.concatenate(all_trajs, axis=0)
        avg = average_trajectories_frames(trajs, p)
        feats = compute_features_for_multiple_trajectories(avg, dt=1.0)
        return videos, y, feats
    return videos, y, None


def mix_trajectory_tails(
    key: jax.Array,
    videos: jax.Array,
    labels: jax.Array,
    n_classes: int,
    n_frames: int,
) -> Tuple[jax.Array, jax.Array]:
    """Sequence-mode tail-swap augmentation (trainModels.py:157-194).

    The reference swaps the tails of video/label pairs across D classes at a
    random split index in ``[nFrames/2 - 5, nFrames/2 + 5)`` for the first
    half of each class (two quarter-blocks against two partner classes). We
    implement the same pairing scheme vectorized: pairs (class0↔class3,
    class0↔class2, class1↔class3, class1↔class2) over quarter-blocks.
    """
    n_total = videos.shape[0]
    n_per = n_total // n_classes
    quarter = n_per // 4
    if quarter == 0 or n_classes < 4:
        return videos, labels

    pairs = [(0, 3, 0), (0, 2, quarter), (1, 3, quarter), (1, 2, 0)]
    frame_idx = jnp.arange(n_frames)
    for pair_i, (ca, cb, start) in enumerate(pairs):
        k = jax.random.fold_in(key, pair_i)
        splits = jax.random.randint(
            k, (quarter,), n_frames // 2 - 5, n_frames // 2 + 5
        )
        ia = ca * n_per + start + jnp.arange(quarter)
        ib = cb * n_per + start + jnp.arange(quarter)
        mask_v = (frame_idx[None, :] >= splits[:, None])[..., None, None]
        va, vb = videos[ia], videos[ib]
        videos = videos.at[ia].set(jnp.where(mask_v, vb, va))
        videos = videos.at[ib].set(jnp.where(mask_v, va, vb))
        mask_l = frame_idx[None, :] >= splits[:, None]
        la, lb = labels[ia], labels[ib]
        labels = labels.at[ia].set(jnp.where(mask_l, lb, la))
        labels = labels.at[ib].set(jnp.where(mask_l, la, lb))
    return videos, labels


def mix_tails_uniform(
    key: jax.Array,
    videos: jax.Array,
    labels: jax.Array,
    n_frames: int,
    fraction: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Continuous-curriculum analog of ``mix_trajectory_tails``.

    The reference's tail-swap augmentation pairs sequences ACROSS D classes
    (trainModels.py:157-194); a continuous curriculum has no classes, so this
    pairs sequence ``i`` with sequence ``n-1-i`` (both drawn i.i.d. from the
    same D distribution, so the pairing is random in D) and swaps their
    video/label tails at a random split in ``[n_frames/2 - 5, n_frames/2 + 5)``
    — the same split window. ``fraction`` controls how many sequences end up
    carrying a transition (default 0.5, matching the discrete scheme where
    the 4 quarter-block pairs touch half of all sequences)."""
    n = videos.shape[0]
    half = int(n * fraction) // 2
    if half == 0:
        return videos, labels
    ia = jnp.arange(half)
    ib = (n - 1) - ia
    splits = jax.random.randint(key, (half,), n_frames // 2 - 5, n_frames // 2 + 5)
    frame_idx = jnp.arange(n_frames)
    mask_v = (frame_idx[None, :] >= splits[:, None])[..., None, None]
    va, vb = videos[ia], videos[ib]
    videos = videos.at[ia].set(jnp.where(mask_v, vb, va))
    videos = videos.at[ib].set(jnp.where(mask_v, va, vb))
    mask_l = frame_idx[None, :] >= splits[:, None]
    la, lb = labels[ia], labels[ib]
    labels = labels.at[ia].set(jnp.where(mask_l, lb, la))
    labels = labels.at[ib].set(jnp.where(mask_l, la, lb))
    return videos, labels


def _loss(pred, y, kind: str):
    if kind == "l1":
        return jnp.mean(jnp.abs(pred - y))
    return jnp.mean((pred - y) ** 2)


def _cast_for_compute(train_cfg: TrainConfig, params, bv, bf):
    """Mixed-precision entry (``TrainConfig.compute_dtype="bfloat16"``):
    cast f32 params and minibatch inputs to bf16 for the forward/backward.
    The caller's params stay the f32 master copy — gradients flow back
    through the cast (its transpose accumulates in f32), so AdamW and its
    state remain full precision. No-op at the default "float32"."""
    if train_cfg.compute_dtype == "float32":
        return params, bv, bf
    if train_cfg.compute_dtype != "bfloat16":
        raise ValueError(f"unknown compute_dtype {train_cfg.compute_dtype!r}")
    cast = lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
    return (
        jax.tree.map(cast, params),
        cast(bv),
        None if bf is None else cast(bf),
    )


def make_train_impls(
    model,
    train_cfg: TrainConfig,
    with_features: bool = False,
    constrain_batch=None,
):
    """UNJITTED ``(init_state, train_cycle, evaluate)`` closures for one model
    — jitted per-model by ``make_train_fns``, or traced into larger fused
    programs (``train.multi``, ``parallel.steps``).

    ``train_cycle(state, videos, labels, features, key, lr, batch_size)``
    runs one epoch (shuffled, scan over minibatches) and returns
    ``(state, mean_loss)``. ``evaluate(state, videos, features)`` returns
    rescaled predictions (× d_max_normalization).

    ``constrain_batch(bv, by, bf) -> (bv, by, bf)`` (optional) re-anchors
    each GATHERED minibatch to a sharding before the grad step — the mesh
    paths pass a ``with_sharding_constraint`` to the per-step batch layout
    here. Without it the XLA partitioner resolves the dynamic permutation
    gather from batch-sharded data by replicating the minibatch, and then —
    with no constraint downstream — replicates the whole forward/backward
    on every device (verified on the compiled HLO: no gradient all-reduce
    exists, only a minibatch-assembly all-reduce). The constraint keeps the
    per-step compute data-parallel, and the gradient mean becomes the
    expected single psum (pinned by tests/test_parallel.py's HLO tests).
    """
    tx = make_optimizer(train_cfg)

    def init_state(key, example_videos, example_features=None) -> TrainState:
        args = (example_videos, example_features) if with_features else (example_videos,)
        params, bstats = init_model(model, key, *args)
        return TrainState(params, bstats, tx.init(params))

    def loss_fn(params, batch_stats, bv, bf, by, dropout_key):
        cparams, bv, bf = _cast_for_compute(train_cfg, params, bv, bf)
        variables = {"params": cparams}
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
        loss = _loss(out.astype(jnp.float32), by, train_cfg.loss)
        return loss, mutated.get("batch_stats", batch_stats)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state, videos, labels, features, idx, k_drop):
        """One minibatch grad+update; ``idx`` gathers the batch, the dropout
        key is derived from the batch's first index (so the merged multi-model
        scan reproduces the per-model scan bit-for-bit). Assumes the LR was
        already injected into ``state.opt_state``."""
        bv = videos[idx]
        by = labels[idx]
        bf = features[idx] if with_features else None
        if constrain_batch is not None:
            bv, by, bf = constrain_batch(bv, by, bf)
        dk = jax.random.fold_in(k_drop, idx[0])
        (loss, new_bstats), grads = grad_fn(state.params, state.batch_stats, bv, bf, by, dk)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bstats, new_opt), loss

    def train_cycle(state, videos, labels, features, key, lr, batch_size: int):
        n = videos.shape[0]
        steps = n // batch_size
        k_perm, k_drop = jax.random.split(key)
        perm = jax.random.permutation(k_perm, n)[: steps * batch_size]
        perm = perm.reshape(steps, batch_size)
        state = state.replace(opt_state=_set_lr(state.opt_state, lr))

        def body(carry, idx):
            return train_step(carry, videos, labels, features, idx, k_drop)

        state, losses = jax.lax.scan(body, state, perm, unroll=train_cfg.scan_unroll)
        return state, jnp.mean(losses)

    def evaluate(state, videos, features=None):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        args = (videos, features) if with_features else (videos,)
        out = model.apply(variables, *args, train=False)
        return out * train_cfg.d_max_normalization

    return TrainImpls(init_state, train_cycle, evaluate, train_step)


def make_train_fns(
    model,
    train_cfg: TrainConfig,
    with_features: bool = False,
):
    """Single-device jitted ``(init_state, train_cycle, evaluate)``; see
    ``make_train_impls``. The incoming state is donated so parameter/
    optimizer buffers update in place instead of reallocating every cycle."""
    impls = make_train_impls(model, train_cfg, with_features)
    train_cycle = jax.jit(
        impls.train_cycle, static_argnames=("batch_size",), donate_argnums=(0,)
    )
    return impls.init_state, train_cycle, jax.jit(impls.evaluate)


def run_training(
    model,
    train_cfg: TrainConfig,
    optics: OpticsConfig,
    val_videos: Dict[float, jax.Array],
    num_cycles: Optional[int] = None,
    with_features: bool = False,
    val_features: Optional[Dict[float, jax.Array]] = None,
    callback: Optional[Callable[[int, Dict[str, float]], None]] = None,
):
    """End-to-end cycle runner for a single model.

    ``val_videos`` maps true D → frozen rendered validation videos
    (the reference's val_1/3/5/7 sets). Returns ``(state, history)`` where
    history mirrors the reference's ``validation_losses`` dict
    ({"val_<D>": [...], "val_avg": [...]}, trainModels.py:50-52).
    """
    num_cycles = num_cycles or train_cfg.num_cycles
    init_state, train_cycle, evaluate = make_train_fns(model, train_cfg, with_features)

    key = jax.random.key(train_cfg.seed)
    k_init, k_loop = jax.random.split(key)
    ex_videos, ex_labels, ex_feats = generate_cycle_data(
        jax.random.fold_in(k_loop, 0), train_cfg, optics, with_features
    )
    state = init_state(k_init, ex_videos[:1], None if not with_features else ex_feats[:1])

    history = {f"val_{d:g}": [] for d in val_videos}
    history["val_avg"] = []
    history["train_loss"] = []

    for cycle in range(num_cycles):
        k_cycle = jax.random.fold_in(k_loop, cycle)
        k_gen, k_train, k_mix = jax.random.split(k_cycle, 3)
        videos, labels, feats = generate_cycle_data(k_gen, train_cfg, optics, with_features)
        if train_cfg.mix_trajectories:
            videos, labels = mix_trajectory_tails(
                k_mix, videos, labels, len(train_cfg.training_ds), train_cfg.n_frames
            )
        state, loss = train_cycle(
            state,
            videos,
            labels,
            feats,
            k_train,
            jnp.float32(train_cfg.lr_for_cycle(cycle)),
            train_cfg.batch_size_for_cycle(cycle),
        )
        history["train_loss"].append(float(loss))

        per_d = []
        for d, vv in val_videos.items():
            vf = val_features.get(d) if val_features else None
            preds = evaluate(state, vv, vf) if with_features else evaluate(state, vv)
            if preds.ndim == 3:  # sequence mode: compare per-frame to constant D
                mse = float(jnp.mean((preds[..., 0] - d) ** 2))
            else:
                mse = float(jnp.mean((preds[:, 0] - d) ** 2))
            history[f"val_{d:g}"].append(mse)
            per_d.append(mse)
        avg = sum(per_d) / len(per_d)
        history["val_avg"].append(avg)
        if callback:
            callback(cycle, {"train_loss": float(loss), "val_avg": avg})
    return state, history

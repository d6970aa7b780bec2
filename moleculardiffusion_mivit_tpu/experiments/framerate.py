"""Framerate / exposure-time experiment (Experiments/Framerate/).

One (transformer, resnet) pair per exposure setting
``nPosPerFrame ∈ [5, 10, 15, 20, 30, 50]`` (≈ 50→500 ms exposure,
trainSettingsFramerate.py:54): the same 300-step trajectories are rendered at
each sub-position count with photon flux scaled ∝ exposure
(``part_mean · nSubPos/10``, :190-193), normalized per rate against its own
theoretical max, and zero-padded to maxFrames = 60 into a
``(N, n_rates, 60, 13, 13)`` tensor (:183-200). Model ``*_i`` consumes the
first ``T // rate_i`` frames of slice i (:157-166).

Per-rate sequence lengths differ (60, 30, 20, 15, 10, 6 tokens) so each pair
is its own compiled entry rather than a vmapped grid.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.config import FRAMERATE_OPTICS, ModelConfig, TrainConfig
from moleculardiffusion_mivit_tpu.evaluation import load_validation_trajectories
from moleculardiffusion_mivit_tpu.experiments.base import (
    Experiment,
    ModelEntry,
    class_sequence_counts,
)
from moleculardiffusion_mivit_tpu.models import GeneralTransformer, MultiImageResNet
from moleculardiffusion_mivit_tpu.sim import (
    normalize_images,
    single_state,
    trajectories_to_video,
)

RATES: Tuple[int, ...] = (5, 10, 15, 20, 30, 50)
ORIGINAL_N_POS = 10


def render_framerate_stack(
    key: jax.Array,
    trajectories: jax.Array,
    optics,
    rates: Tuple[int, ...] = RATES,
    center: bool = True,
):
    """(N, T, 2) → (N, len(rates), maxFrames, S, S), zero-padded."""
    n, t, _ = trajectories.shape
    max_frames = t // rates[0]
    s = optics.output_size
    part_mean, part_std = optics.particle_intensity
    bg_mean, bg_sigma = optics.background_intensity

    slices = []
    for i, rate in enumerate(rates):
        if t % rate != 0:
            raise ValueError(f"T={t} not divisible by rate {rate}")
        flux = part_mean * (rate / ORIGINAL_N_POS)
        optics_rate = optics.replace(particle_intensity=(flux, part_std))
        vids = trajectories_to_video(
            jax.random.fold_in(key, i), trajectories, rate, center, optics_rate
        )
        vids, _ = normalize_images(vids, bg_mean, bg_sigma, bg_mean + flux)
        n_frames = t // rate
        pad = max_frames - n_frames
        vids = jnp.pad(vids, ((0, 0), (0, pad), (0, 0), (0, 0)))
        slices.append(vids)
    return jnp.stack(slices, axis=1)


def build(
    seed: int = 0,
    rates: Tuple[int, ...] = RATES,
    sequences_per_d: int = 64,
    val_length: int = 30,
    val_d_values=(1.0, 3.0, 5.0, 7.0, 9.0),
    continuous_d: Optional[Tuple[float, float]] = None,
) -> Experiment:
    """``continuous_d=(lo, hi)`` replaces the discrete class list with a
    per-sequence D ~ Uniform(lo, hi) curriculum (the framework-enabled
    densification that took the MiViT 0.377 → 0.314, RESULTS.md) at a
    matched per-cycle data budget (5.5 × sequences_per_d, the discrete
    list's total incl. its half class)."""
    # Training D list incl. the half-count (10.2, 1) tail class — the
    # reference's committed list (trainModelsFramerate.py:45; N//2 at :127)
    # covers the top of the 0.1..10.0 evaluation sweep.
    train_cfg = TrainConfig(
        seed=seed,
        sequences_per_d=sequences_per_d,
        training_ds=((1, 1), (3, 1), (5, 1), (7, 1), (9, 1), (10.2, 1)),
        n_frames=val_length,
        n_pos_per_frame=ORIGINAL_N_POS,
    )
    model_cfg = ModelConfig(patch_size=13, use_pos_encoding=False)
    optics = FRAMERATE_OPTICS
    t = train_cfg.n_frames * ORIGINAL_N_POS

    def make_slice(i, rate):
        frames = t // rate

        def slice_fn(data):
            return data["videos"][:, i, :frames], None, data["labels"]

        return slice_fn

    arms = {}
    for i, rate in enumerate(rates):
        arms[f"tr_{i}"] = ModelEntry(
            model=GeneralTransformer(model_cfg, embedding="deep_resnet"),
            slice_fn=make_slice(i, rate),
        )
        arms[f"res_{i}"] = ModelEntry(
            model=MultiImageResNet(), slice_fn=make_slice(i, rate)
        )

    if continuous_d is not None:
        from moleculardiffusion_mivit_tpu.sim.trajectory import brownian_motion

        d_lo, d_hi = continuous_d
        # same per-cycle data budget as the discrete schedule (incl. the
        # half-count tail class)
        n_total = sum(class_sequence_counts(train_cfg.training_ds, sequences_per_d))

        def generate_fn(key):
            kd, kt, kr = jax.random.split(key, 3)
            d = jax.random.uniform(kd, (n_total,), minval=d_lo, maxval=d_hi)
            trajs = (
                brownian_motion(
                    kt, n_total, train_cfg.n_frames, ORIGINAL_N_POS, d,
                    float(ORIGINAL_N_POS),
                )
                / train_cfg.traj_div_factor
            )
            return {
                "videos": render_framerate_stack(kr, trajs, optics, rates),
                "labels": (d / train_cfg.d_max_normalization)[:, None],
            }

    else:

        counts = class_sequence_counts(train_cfg.training_ds, sequences_per_d)

        def generate_fn(key):
            all_videos, all_labels = [], []
            for i, (ds, n) in enumerate(zip(train_cfg.training_ds, counts)):
                k_sim, k_render = jax.random.split(jax.random.fold_in(key, i))
                trajs, labels = single_state(k_sim, n, t, Ds=tuple(ds))
                trajs = trajs / train_cfg.traj_div_factor
                all_videos.append(render_framerate_stack(k_render, trajs, optics, rates))
                all_labels.append(labels[:, :1, 1] / train_cfg.d_max_normalization)
            return {
                "videos": jnp.concatenate(all_videos, axis=0),
                "labels": jnp.concatenate(all_labels, axis=0),
            }

    trajs = load_validation_trajectories(length=val_length)
    key = jax.random.key(seed + 99)
    val_data = {}
    for d in val_d_values:
        name = f"val{d:g}"
        if name in trajs:
            tr = jnp.asarray(trajs[name], jnp.float32) / train_cfg.traj_div_factor
            vids = render_framerate_stack(jax.random.fold_in(key, int(d)), tr, optics, rates)
            val_data[d] = {"videos": vids, "labels": None}

    return Experiment("framerate", train_cfg, optics, arms, generate_fn, val_data)

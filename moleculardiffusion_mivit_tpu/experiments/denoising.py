"""Denoising experiment (Experiments/Denoising/).

Seven input settings — no_noise, gaussian_noise, poisson_noise, gauss_filter,
RL_2, RL_5, RL_10 (trainSettingsMult.py:84-88) — each with a transformer and
a resnet (14 models), trained with **L1 loss** (:32-34) for **10 cycles**
(trainModels_different_settings.py:56) on D classes [1,3,5,7]. Each cycle
renders the 4 aligned noise variants, normalizes, RL-TV-deconvolves the
Poisson arm at iterations [2,5,10] and stacks to ``(N, 7, F, 9, 9)``
(helpersGeneration.py:635-658); model ``*_<setting>`` trains on slice
``videos[:, idx]`` (trainModels_different_settings.py:197-199).

All 7 transformers share one architecture → one vmapped GridArm; same for
the 7 resnets.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.config import ModelConfig, OpticsConfig, TrainConfig
from moleculardiffusion_mivit_tpu.denoise import trajs_to_vid_norm_rl
from moleculardiffusion_mivit_tpu.evaluation import load_validation_trajectories
from moleculardiffusion_mivit_tpu.experiments.base import Experiment, GridArm
from moleculardiffusion_mivit_tpu.models import GeneralTransformer, MultiImageResNet
from moleculardiffusion_mivit_tpu.sim import single_state

RL_ITERATIONS: Tuple[int, ...] = (2, 5, 10)
SETTINGS = ("no_noise", "gaussian_noise", "poisson_noise", "gauss_filter", "RL_2", "RL_5", "RL_10")

# Denoising optics (trainSettingsMult.py:58-80): part_mean = 5400 - 1420.
DENOISING_OPTICS = OpticsConfig(
    particle_intensity=(5400.0 - 1420.0, 500.0),
    psf_division_factor=1.3,
    output_size=9,
    background_intensity=(1420.0, 290.0),
    poisson_noise=100.0,
    trajectory_unit=1200.0,
)


def build(
    seed: int = 0,
    sequences_per_d: int = 64,
    val_length: int = 30,
    val_d_values=(1.0, 3.0, 5.0, 7.0),
) -> Experiment:
    train_cfg = TrainConfig(
        seed=seed,
        num_cycles=10,  # trainModels_different_settings.py:56
        sequences_per_d=sequences_per_d,
        training_ds=((1, 1), (3, 1), (5, 1), (7, 1)),
        n_frames=val_length,
        loss="l1",
    )
    model_cfg = ModelConfig(use_pos_encoding=True)
    optics = DENOISING_OPTICS
    p = train_cfg.n_pos_per_frame
    t = train_cfg.n_frames * p

    def grid_slice(data):
        v = data["videos"]  # (N, 7, F, S, S)
        videos_m = jnp.transpose(v, (1, 0, 2, 3, 4))
        labels = data["labels"]
        labels_m = (
            None
            if labels is None
            else jnp.broadcast_to(labels[None], (len(SETTINGS),) + labels.shape)
        )
        return videos_m, None, labels_m

    arms = {
        "trans_grid": GridArm(
            model=GeneralTransformer(model_cfg, embedding="deep_resnet"),
            names=[f"trans_{s}" for s in SETTINGS],
            slice_fn=grid_slice,
        ),
        "resnet_grid": GridArm(
            model=MultiImageResNet(),
            names=[f"resnet_{s}" for s in SETTINGS],
            slice_fn=grid_slice,
        ),
    }

    def generate_fn(key):
        all_videos, all_labels = [], []
        for i, ds in enumerate(train_cfg.training_ds):
            k_sim, k_render = jax.random.split(jax.random.fold_in(key, i))
            trajs, labels = single_state(k_sim, sequences_per_d, t, Ds=tuple(ds))
            trajs = trajs / train_cfg.traj_div_factor
            vids = trajs_to_vid_norm_rl(k_render, trajs, p, train_cfg.center, optics, RL_ITERATIONS)
            all_videos.append(vids)
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
            vids = trajs_to_vid_norm_rl(
                jax.random.fold_in(key, int(d)), tr, p, train_cfg.center, optics, RL_ITERATIONS
            )
            val_data[d] = {"videos": vids, "labels": None}

    return Experiment("denoising", train_cfg, optics, arms, generate_fn, val_data)

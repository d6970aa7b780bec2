"""Baseline experiment (tests/train_tests/{trainSettings,trainModels}.py).

Seven models — three embeddings × {relu, leaky_relu} GeneralTransformers plus
MultiImageResNet (trainSettings.py:83-134) — trained on 4 D classes × 64
sequences per cycle with real-data-derived optics (patch 9, 30 frames,
trajectory_unit 1200). Sequence mode (``sequences=True``) switches to
per-frame predictions with positional encoding and tail-swap trajectory
mixing (trainModels.py:157-194).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.config import BASELINE_OPTICS, ModelConfig, TrainConfig
from moleculardiffusion_mivit_tpu.evaluation import (
    IN_ORDER_D_VALUES,
    load_validation_trajectories,
    render_validation_videos,
)
from moleculardiffusion_mivit_tpu.experiments.base import Experiment, ModelEntry
from moleculardiffusion_mivit_tpu.models import GeneralTransformer, MultiImageResNet
from moleculardiffusion_mivit_tpu.train.loop import generate_cycle_data, mix_trajectory_tails


def build(
    seed: int = 0,
    sequences: bool = False,
    try_leaky_relu: bool = True,
    val_length: int = 30,
    val_d_values=(1.0, 3.0, 5.0, 7.0),
    sequences_per_d: int = 64,
    continuous_d=None,
) -> Experiment:
    """``continuous_d=(lo, hi)`` swaps the 4-class curriculum for per-sequence
    D ~ Uniform(lo, hi) at the same per-cycle budget (4 × sequences_per_d) —
    the densification that improved every regression regime (RESULTS.md). In
    sequence mode the per-frame labels carry the drawn D and the tail-swap
    augmentation becomes ``train.loop.mix_tails_uniform`` (random-partner
    pairing — there are no classes to pair across). ``training_ds`` is
    unchanged, so validation/eval sets built from ``train_cfg`` stay the
    discrete-protocol assets (comparable across curricula)."""
    train_cfg = TrainConfig(
        seed=seed,
        sequences_per_d=sequences_per_d,
        training_ds=((1, 1), (3, 1), (5, 1), (7, 1)),
        n_frames=val_length,
        sequence_mode=sequences,
        mix_trajectories=sequences,
    )
    model_cfg = ModelConfig(
        use_pos_encoding=True,  # trainSettings.py:26/34: on in both modes
        use_regression_token=not sequences,
        single_prediction=not sequences,
    )
    optics = BASELINE_OPTICS

    def identity_slice(data):
        return data["videos"], None, data["labels"]

    arms = {}
    for act, suffix in [("relu", "_s")] + ([("leaky_relu", "_leaky")] if try_leaky_relu else []):
        for emb_key, emb in [
            ("linear_2layer", "linear"),
            ("cnn_2layer", "cnn"),
            ("deepcnn_2layer", "deep_resnet"),
        ]:
            arms[emb_key + suffix] = ModelEntry(
                model=GeneralTransformer(model_cfg.replace(activation=act), embedding=emb),
                slice_fn=identity_slice,
            )
    arms["resnet"] = ModelEntry(
        model=MultiImageResNet(single_prediction=not sequences), slice_fn=identity_slice
    )

    if continuous_d is not None:
        from moleculardiffusion_mivit_tpu.sim import normalize_images, trajectories_to_video
        from moleculardiffusion_mivit_tpu.sim.trajectory import brownian_motion
        from moleculardiffusion_mivit_tpu.train.loop import mix_tails_uniform

        d_lo, d_hi = continuous_d
        n_total = sequences_per_d * len(train_cfg.training_ds)
        p = train_cfg.n_pos_per_frame
        bg_mean, bg_sigma = optics.background_intensity
        part_mean = optics.particle_intensity[0]

        def generate_fn(key):
            kd, kt, kr, k_mix = jax.random.split(key, 4)
            d = jax.random.uniform(kd, (n_total,), minval=d_lo, maxval=d_hi)
            trajs = (
                brownian_motion(kt, n_total, train_cfg.n_frames, p, d, float(p))
                / train_cfg.traj_div_factor
            )
            videos = trajectories_to_video(kr, trajs, p, train_cfg.center, optics)
            videos, _ = normalize_images(videos, bg_mean, bg_sigma, part_mean + bg_mean)
            dn = d / train_cfg.d_max_normalization
            if train_cfg.sequence_mode:
                labels = jnp.broadcast_to(
                    dn[:, None], (n_total, train_cfg.n_frames)
                ).astype(jnp.float32)
            else:
                labels = dn[:, None]
            if train_cfg.mix_trajectories:
                videos, labels = mix_tails_uniform(
                    k_mix, videos, labels, train_cfg.n_frames
                )
            return {"videos": videos, "labels": labels}

    else:

        def generate_fn(key):
            k_gen, k_mix = jax.random.split(key)
            videos, labels, _ = generate_cycle_data(k_gen, train_cfg, optics)
            if train_cfg.mix_trajectories:
                videos, labels = mix_trajectory_tails(
                    k_mix, videos, labels, len(train_cfg.training_ds), train_cfg.n_frames
                )
            return {"videos": videos, "labels": labels}

    trajs = load_validation_trajectories(length=val_length)
    rendered = render_validation_videos(trajs, train_cfg, optics)
    val_data = {
        d: {"videos": rendered[f"val{d:g}"], "labels": None}
        for d in val_d_values
        if f"val{d:g}" in rendered
    }
    in_order = None
    if "valTrajsInOrder" in rendered:
        vids = rendered["valTrajsInOrder"]
        n_d, n_p = vids.shape[:2]
        in_order = {
            "videos": vids.reshape((n_d * n_p,) + vids.shape[2:]),
            "labels": None,
            "d_values": IN_ORDER_D_VALUES[:n_d],
        }

    return Experiment("baseline", train_cfg, optics, arms, generate_fn, val_data, in_order)

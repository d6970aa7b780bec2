"""PSFNoise experiment — the published 5 PSF × 6 noise grid
(Experiments/PSFNoise/trainSettingsPSFNoise.py, trainModelsPSFNoise.py).

60 models (transformer + resnet per grid cell) trained on 6 D classes
([1,3,5,7,9] × 64 + [10.2] × 32 sequences, trainModelsPSFNoise.py:45,128)
rendered once per cycle into the (N, 5, 6, F, 9, 9) grid tensor; each model
trains on its own grid cell (``make_prediction`` slicing,
trainSettingsPSFNoise.py:164-172).

TPU-native: the 30 transformers form one vmapped ``GridArm`` and the 30
resnets another — two compiled programs instead of 60 sequential torch loops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.config import PSFNOISE_OPTICS, ModelConfig, TrainConfig
from moleculardiffusion_mivit_tpu.evaluation import (
    IN_ORDER_D_VALUES,
    load_validation_trajectories,
)
from moleculardiffusion_mivit_tpu.experiments.base import (
    Experiment,
    GridArm,
    class_sequence_counts,
)
from moleculardiffusion_mivit_tpu.models import GeneralTransformer, MultiImageResNet
from moleculardiffusion_mivit_tpu.sim import single_state, trajectories_to_video_psf_noise_grid

PSF_SETTINGS: Tuple[float, ...] = (2.0, 1.75, 1.5, 1.25, 1.0)
NOISE_SETTINGS: Tuple[float, ...] = (0.0, 1 / 50, 1 / 25, 1 / 20, 1 / 10, 1 / 5)


def build(
    seed: int = 0,
    sequences_per_d: int = 64,
    psf_settings: Tuple[float, ...] = PSF_SETTINGS,
    noise_settings: Tuple[float, ...] = NOISE_SETTINGS,
    val_length: int = 30,
    val_d_values=(1.0, 3.0, 5.0, 7.0, 9.0),
    with_in_order: bool = False,
    in_order_suite: str = "imft",
) -> Experiment:
    """``in_order_suite``: which D sweep the poster-style scoring uses —
    ``"imft"`` (default) is the RECONCILED published protocol: the
    reference's PSFNoise loader also defines ``val_d_in_order =
    arange(0.1, 10.01, 0.1)`` (100 values) and reshapes the rendered stack
    to ``(len(val_d_in_order), 10, ...)`` (trainSettingsPSFNoise.py:128,
    159-160), which the committed 70-slice asset cannot satisfy (700 ≠
    1000 sequences) — so the published grid CSV was scored on a lost
    100-value suite, deterministically regenerated here exactly like the
    ImagesFeatures/Framerate reconciliation (see
    examples/msd_protocol_reconciliation.py). ``"committed"`` scores on the
    snapshot's 70-value valTrajsInOrder.npy (D ≤ 7.0) as rounds 1-2 did."""
    n_psf, n_noise = len(psf_settings), len(noise_settings)
    train_cfg = TrainConfig(
        seed=seed,
        sequences_per_d=sequences_per_d,
        training_ds=((1, 1), (3, 1), (5, 1), (7, 1), (9, 1), (10.2, 1)),
        n_frames=val_length,
    )
    model_cfg = ModelConfig(use_pos_encoding=False)
    optics = PSFNOISE_OPTICS

    tr_names = [f"tr_{i}_{j}" for i in range(n_psf) for j in range(n_noise)]
    res_names = [f"res_{i}_{j}" for i in range(n_psf) for j in range(n_noise)]

    def grid_slice(data):
        """(N, P, Noise, F, S, S) → model-major (M, N, F, S, S) + tiled labels.

        The last D class trains on half the sequences in the reference
        (N//2 for D=10.2); we generate half and all models share the set."""
        v = data["videos"]
        n = v.shape[0]
        m = n_psf * n_noise
        videos_m = jnp.transpose(v, (1, 2, 0, 3, 4, 5)).reshape((m, n) + v.shape[3:])
        labels = data["labels"]
        labels_m = (
            None if labels is None else jnp.broadcast_to(labels[None], (m,) + labels.shape)
        )
        return videos_m, None, labels_m

    arms = {
        "tr_grid": GridArm(
            model=GeneralTransformer(model_cfg, embedding="deep_resnet"),
            names=tr_names,
            slice_fn=grid_slice,
        ),
        "res_grid": GridArm(
            model=MultiImageResNet(), names=res_names, slice_fn=grid_slice
        ),
    }

    p = train_cfg.n_pos_per_frame
    t = train_cfg.n_frames * p

    counts = class_sequence_counts(train_cfg.training_ds, sequences_per_d)

    def generate_fn(key):
        all_videos, all_labels = [], []
        for i, (ds, n) in enumerate(zip(train_cfg.training_ds, counts)):
            k_sim, k_render = jax.random.split(jax.random.fold_in(key, i))
            trajs, labels = single_state(k_sim, n, t, Ds=tuple(ds))
            trajs = trajs / train_cfg.traj_div_factor
            videos = trajectories_to_video_psf_noise_grid(
                k_render, trajs, p, train_cfg.center, optics, psf_settings, noise_settings
            )
            all_videos.append(videos)
            all_labels.append(labels[:, :1, 1] / train_cfg.d_max_normalization)
        return {
            "videos": jnp.concatenate(all_videos, axis=0),
            "labels": jnp.concatenate(all_labels, axis=0),
        }

    trajs = load_validation_trajectories(length=val_length)
    key = jax.random.key(seed + 99)

    def render_val(k, tr):
        tr = jnp.asarray(tr, jnp.float32) / train_cfg.traj_div_factor
        return trajectories_to_video_psf_noise_grid(
            k, tr, p, train_cfg.center, optics, psf_settings, noise_settings
        )

    val_data = {}
    for d in val_d_values:
        name = f"val{d:g}"
        if name in trajs:
            vids = render_val(jax.random.fold_in(key, int(d)), trajs[name])
            val_data[d] = {"videos": vids, "labels": None}

    in_order = None
    if with_in_order:
        if in_order_suite == "imft":
            from moleculardiffusion_mivit_tpu.evaluation import (
                IN_ORDER_IMFT_D_VALUES,
                generate_in_order_imft,
            )

            arr = generate_in_order_imft(t_steps=t)
            d_values = IN_ORDER_IMFT_D_VALUES
        elif in_order_suite == "committed":
            arr = trajs.get("valTrajsInOrder")
            d_values = IN_ORDER_D_VALUES
        else:
            raise ValueError(
                f"unknown in_order_suite {in_order_suite!r}; expected 'imft' "
                "(reconciled 100-value D=0.1..10.0 protocol) or 'committed' "
                "(the snapshot's 70-value valTrajsInOrder asset)"
            )
        if arr is not None:
            arr = jnp.asarray(arr)
            n_d, n_p_particles = arr.shape[:2]
            flat = arr.reshape(n_d * n_p_particles, arr.shape[2], 2)
            vids = render_val(jax.random.fold_in(key, 777), flat)
            in_order = {
                "videos": vids,
                "labels": None,
                "d_values": tuple(d_values)[:n_d],
            }

    return Experiment("psfnoise", train_cfg, optics, arms, generate_fn, val_data, in_order)

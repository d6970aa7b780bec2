"""ImagesFeatures (hybrid) experiment — the poster's headline comparison
(Experiments/ImagesFeatures/).

Learned arms (trainSettingsImagesFeatures.py:119-177): image-only transformer
(``im_tr``), early/late feature-fusion transformers (``im_ft_early_tr``,
``im_ft_late_tr``), image-only CNN (``im_resnet``), CNN+features
(``im_ft_resnet``), features-only MLP (``ft_mlp``). Non-learned MSD baselines
(:233-252, 307-315): ``MSD_Perfect`` = MSD(τ=1) of the raw sub-position
trajectory × 250, ``MSD_Frame`` / ``MSD_Localized`` = MSD(τ=1) of the
frame-averaged (± localization noise N(0, 0.01)) trajectory × 37.5.

Each cycle builds (videos, 25-dim features, trajectory variants) via the
equivalent of ``create_video_and_feature_pairs`` (helpersGeneration.py:
674-719). Rotation test-time augmentation (0/90/180/270° prediction
averaging, trainSettingsImagesFeatures.py:255-300) is available through
``tta_error_tables``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.config import BASELINE_OPTICS, ModelConfig, TrainConfig
from moleculardiffusion_mivit_tpu.evaluation import load_validation_trajectories
from moleculardiffusion_mivit_tpu.experiments.base import Experiment, ModelEntry, rotate_videos
from moleculardiffusion_mivit_tpu.features import (
    N_FEATURES,
    compute_features_for_multiple_trajectories,
    d_from_msd_tau1,
)
from moleculardiffusion_mivit_tpu.models import (
    GeneralTransformer,
    MLPHead,
    MultiImageFeatureResNet,
    MultiImageResNet,
)
from moleculardiffusion_mivit_tpu.sim import normalize_images, single_state, trajectories_to_video
from moleculardiffusion_mivit_tpu.sim.trajectory import average_trajectories_frames

MSD_MULT_FACTOR = 250.0  # raw sub-position trajectories (dt = 1 sub-step)
MSD_MULT_FACTOR_AVG = 37.5  # frame-averaged trajectories
LOCALIZATION_UNCERTAINTY = (0.0, 0.01)


class FeatureMLP(nn.Module):
    """ft_mlp arm: MLPHead applied directly to the 25 features
    (trainSettingsImagesFeatures.py:176)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, features, train: bool = False):
        return MLPHead(self.hidden_dim, name="head")(features, deterministic=not train)


def make_dataset(key, trajs, train_cfg, optics, dt: float = 1.0):
    """The ``create_video_and_feature_pairs`` equivalent: normalized videos,
    25-dim features of the frame-averaged trajectory, and the three
    trajectory variants (raw, averaged, averaged+localization error)."""
    p = train_cfg.n_pos_per_frame
    bg_mean, bg_sigma = optics.background_intensity
    part_mean = optics.particle_intensity[0]
    k_render, k_err = jax.random.split(key)
    videos = trajectories_to_video(k_render, trajs, p, train_cfg.center, optics)
    videos, _ = normalize_images(videos, bg_mean, bg_sigma, part_mean + bg_mean)
    trajs_avg = average_trajectories_frames(trajs, p)
    err_mean, err_sigma = LOCALIZATION_UNCERTAINTY
    noise = err_mean + err_sigma * jax.random.normal(k_err, trajs_avg.shape)
    trajs_avg_err = trajs_avg + noise
    features = compute_features_for_multiple_trajectories(trajs_avg, dt=dt)
    return {
        "videos": videos,
        "features": features,
        "trajs_raw": trajs,
        "trajs_avg": trajs_avg,
        "trajs_avg_err": trajs_avg_err,
    }


def build(
    seed: int = 0,
    sequences_per_d: int = 64,
    val_length: int = 30,
    val_d_values=(1.0, 3.0, 5.0, 7.0, 9.0),
    with_in_order: bool = False,
    in_order_suite: str = "imft",
) -> Experiment:
    """``in_order_suite``: which D sweep the poster-style scoring uses —
    ``"imft"`` (default) is the RECONCILED published protocol, a
    deterministic regeneration of the reference's lost 100-value
    D = 0.1..10.0 suite (its loader reshapes to ``len(val_d_in_order)=100``
    slices, trainSettingsImagesFeatures.py:191+223, which the committed
    70-value asset cannot satisfy; scoring the training-free MSD arms on
    this suite reproduces all three published MSD rows —
    examples/msd_protocol_reconciliation.py); ``"committed"`` scores on the
    snapshot's 70-value valTrajsInOrder.npy (D ≤ 7.0) as rounds 1-2 did."""
    # Training D list incl. (9, 1) — the reference's committed list
    # (trainModelsImagesFeatures.py:44), covering the top of the 0.1..10.0
    # evaluation sweep.
    train_cfg = TrainConfig(
        seed=seed,
        sequences_per_d=sequences_per_d,
        training_ds=((1, 1), (3, 1), (5, 1), (7, 1), (9, 1)),
        n_frames=val_length,
    )
    model_cfg = ModelConfig(use_pos_encoding=False)
    optics = BASELINE_OPTICS

    def im_slice(data):
        return data["videos"], None, data["labels"]

    def im_ft_slice(data):
        return data["videos"], data["features"], data["labels"]

    def ft_slice(data):
        return data["features"], None, data["labels"]

    arms = {
        "im_tr": ModelEntry(
            model=GeneralTransformer(model_cfg, embedding="deep_resnet"), slice_fn=im_slice
        ),
        "im_ft_early_tr": ModelEntry(
            model=GeneralTransformer(
                model_cfg,
                embedding="deep_resnet",
                use_global_features=True,
                fusion_type="early",
                global_feature_dim=N_FEATURES,
            ),
            slice_fn=im_ft_slice,
            with_features=True,
        ),
        "im_ft_late_tr": ModelEntry(
            model=GeneralTransformer(
                model_cfg,
                embedding="deep_resnet",
                use_global_features=True,
                fusion_type="late",
                global_feature_dim=N_FEATURES,
            ),
            slice_fn=im_ft_slice,
            with_features=True,
        ),
        "im_resnet": ModelEntry(model=MultiImageResNet(), slice_fn=im_slice),
        "im_ft_resnet": ModelEntry(
            model=MultiImageFeatureResNet(
                external_dim=N_FEATURES, feature_size=model_cfg.embed_dim,
                hidden_size=model_cfg.hidden_dim,
            ),
            slice_fn=im_ft_slice,
            with_features=True,
        ),
        "ft_mlp": ModelEntry(model=FeatureMLP(), slice_fn=ft_slice),
        # The reference rescales MSD-arm predictions by D_max like model
        # outputs (analysis notebooks score pred·10 − true), so the full
        # physical-unit calibration is MSD(τ=1) × factor × D_max.
        "MSD_Perfect": ModelEntry(
            baseline_fn=lambda d: d_from_msd_tau1(d["trajs_raw"])
            * MSD_MULT_FACTOR
            * train_cfg.d_max_normalization
        ),
        "MSD_Frame": ModelEntry(
            baseline_fn=lambda d: d_from_msd_tau1(d["trajs_avg"])
            * MSD_MULT_FACTOR_AVG
            * train_cfg.d_max_normalization
        ),
        "MSD_Localized": ModelEntry(
            baseline_fn=lambda d: d_from_msd_tau1(d["trajs_avg_err"])
            * MSD_MULT_FACTOR_AVG
            * train_cfg.d_max_normalization
        ),
    }

    p = train_cfg.n_pos_per_frame
    t = train_cfg.n_frames * p

    def generate_fn(key):
        all_data, all_labels = [], []
        for i, ds in enumerate(train_cfg.training_ds):
            k_sim, k_data = jax.random.split(jax.random.fold_in(key, i))
            trajs, labels = single_state(k_sim, sequences_per_d, t, Ds=tuple(ds))
            trajs = trajs / train_cfg.traj_div_factor
            all_data.append(make_dataset(k_data, trajs, train_cfg, optics))
            all_labels.append(labels[:, :1, 1] / train_cfg.d_max_normalization)
        merged = {
            k: jnp.concatenate([d[k] for d in all_data], axis=0) for k in all_data[0]
        }
        merged["labels"] = jnp.concatenate(all_labels, axis=0)
        return merged

    frozen = load_validation_trajectories(length=val_length)
    key = jax.random.key(seed + 99)
    val_data = {}
    for d in val_d_values:
        name = f"val{d:g}"
        if name in frozen:
            tr = jnp.asarray(frozen[name], jnp.float32) / train_cfg.traj_div_factor
            vdata = make_dataset(jax.random.fold_in(key, int(d)), tr, train_cfg, optics)
            vdata["labels"] = None
            val_data[d] = vdata

    in_order = None
    if with_in_order:
        from moleculardiffusion_mivit_tpu.evaluation import (
            IN_ORDER_D_VALUES,
            IN_ORDER_IMFT_D_VALUES,
            build_in_order_data,
            generate_in_order_imft,
        )

        if in_order_suite == "imft":
            arr = generate_in_order_imft(t_steps=train_cfg.n_frames * p)
            d_values = IN_ORDER_IMFT_D_VALUES
        elif in_order_suite == "committed":
            arr = frozen.get("valTrajsInOrder")
            d_values = IN_ORDER_D_VALUES
        else:
            raise ValueError(
                f"unknown in_order_suite {in_order_suite!r}; expected 'imft' "
                "(reconciled 100-value D=0.1..10.0 protocol) or 'committed' "
                "(the snapshot's 70-value valTrajsInOrder asset)"
            )
        if arr is not None:
            in_order = build_in_order_data(
                arr, d_values, key, train_cfg, optics, make_dataset
            )

    return Experiment(
        "images_features", train_cfg, optics, arms, generate_fn, val_data, in_order
    )


def tta_error_tables(exp: Experiment, data, d_values):
    """Rotation-TTA evaluation of the trained image arms: mean prediction
    over 0/90/180/270° (trainSettingsImagesFeatures.py:255-300). Returns
    poster-style error tables keyed like the reference's *_rot names."""
    from moleculardiffusion_mivit_tpu.evaluation import error_table

    out = {}
    for name, rot_name in [
        ("im_tr", "im_tr_rot"),
        ("im_resnet", "im_res_rot"),
        ("im_ft_resnet", "im_ft_res_rot"),
        ("im_ft_early_tr", "im_ft_tr_rot"),
    ]:
        arm = exp.arms[name]
        _, evaluate = exp._fns[name]
        videos, feats, _ = arm.slice_fn(data)
        preds = []
        for k in range(4):
            v = rotate_videos(videos, k)
            preds.append(
                evaluate(exp.states[name], v, feats)
                if arm.with_features
                else evaluate(exp.states[name], v)
            )
        mean_pred = jnp.mean(jnp.stack(preds), axis=0)
        out[rot_name] = error_table(
            jnp.reshape(mean_pred[..., 0], (len(d_values), -1)), d_values
        )
    return out

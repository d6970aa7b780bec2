"""Mitochondria constrained-diffusion demo — the experiment the reference
abandoned for time (README.md:84; Experiments/mitochondria_simulation/).

End-to-end: build an edge-list skeleton geometry (connectivity-validated,
mitochnodria.py:37-176), simulate 1-D fBm of molecules constrained to it
(mitochnodria.py:339-475), render the constrained trajectories into noisy
fluorescence videos with the standard optics, and recover D two ways —
the MSD tau=1 baseline and a MiViT trained on the fly on matched
*constrained* training data. Writes a 4-panel figure.

Along a (mostly straight) 1-D path the 2-D MSD grows as 2·D·t, not 4·D·t,
so the naive 2-D estimator reads ~D/2 — the geometry-aware factor 2 (not 4)
recovers D. The MiViT is trained on constrained sequences so it learns the
confined statistics directly.

Run: python examples/mitochondria_demo.py [--cycles N] [out.png]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from moleculardiffusion_mivit_tpu.config import BASELINE_OPTICS, ModelConfig, TrainConfig
from moleculardiffusion_mivit_tpu.models import GeneralTransformer
from moleculardiffusion_mivit_tpu.sim import (
    Edge,
    PiecewiseLinearGeometry,
    normalize_images,
    trajectories_to_video,
)
from moleculardiffusion_mivit_tpu.train.loop import make_train_fns


def build_skeleton() -> PiecewiseLinearGeometry:
    """A bent 3-edge mitochondrion skeleton, ~200 trajectory-units long
    (trajectory units of 100 nm, BASELINE_OPTICS.trajectory_unit)."""
    return PiecewiseLinearGeometry.from_edges(
        [
            Edge((0.0, 0.0), (80.0, 10.0)),
            Edge((80.0, 10.0), (130.0, 60.0)),
            Edge((130.0, 60.0), (210.0, 70.0)),
        ]
    )


def constrained_batch(key, geo, n, n_frames, n_pos, d_values):
    """Render n constrained sequences per D: returns (videos, labels_D)."""
    videos, labels = [], []
    for i, d in enumerate(d_values):
        k_sim, k_render = jax.random.split(jax.random.fold_in(key, i))
        # D in trajectory-units²/step, exactly the single_state convention;
        # positions /100 before rendering like the training pipeline
        # (trainModels.py:144)
        trajs = geo.simulate(
            k_sim, n, n_frames * n_pos, D=float(d),
            initial_distance=geo.total_length / 2.0,
        )
        v = trajectories_to_video(k_render, trajs / 100.0, n_pos, True, BASELINE_OPTICS)
        bg_mean, bg_sigma = BASELINE_OPTICS.background_intensity
        v, _ = normalize_images(
            v, bg_mean, bg_sigma, BASELINE_OPTICS.particle_intensity[0] + bg_mean
        )
        videos.append(v)
        labels.append(jnp.full((n, 1), d, jnp.float32))
    return jnp.concatenate(videos), jnp.concatenate(labels)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=15)
    ap.add_argument("out", nargs="?", default="mitochondria_demo.png")
    args = ap.parse_args(argv)

    geo = build_skeleton()
    train_cfg = TrainConfig(num_cycles=args.cycles)
    n_frames, n_pos = train_cfg.n_frames, train_cfg.n_pos_per_frame
    d_train = [1.0, 3.0, 5.0, 7.0]
    d_eval = 4.0
    key = jax.random.key(42)

    # --- evaluation set: constrained molecules at the held-out D
    k_eval, k_train_data, k_init = jax.random.split(key, 3)
    eval_videos, _ = constrained_batch(k_eval, geo, 50, n_frames, n_pos, [d_eval])
    eval_trajs = geo.simulate(
        jax.random.fold_in(k_eval, 99), 50, n_frames * n_pos,
        D=d_eval, initial_distance=geo.total_length / 2.0,
    )

    # --- MSD baseline on the (sub-position) constrained trajectories
    disp = jnp.diff(eval_trajs, axis=1)
    msd1 = float((disp**2).sum(-1).mean())
    d_msd_naive = msd1 / 4.0  # 2-D free-diffusion estimator
    d_msd_confined = msd1 / 2.0  # geometry-aware 1-D factor

    # --- MiViT trained on constrained data (fresh data each cycle)
    model = GeneralTransformer(ModelConfig(), embedding="deep_resnet")
    init_state, train_cycle, evaluate = make_train_fns(model, train_cfg)
    state = init_state(k_init, eval_videos[:1])
    for cycle in range(args.cycles):
        k_c = jax.random.fold_in(k_train_data, cycle)
        videos, labels = constrained_batch(k_c, geo, 16, n_frames, n_pos, d_train)
        state, loss = train_cycle(
            state, videos, labels / train_cfg.d_max_normalization, None,
            jax.random.fold_in(k_c, 7), jnp.float32(train_cfg.lr_for_cycle(cycle)),
            train_cfg.batch_size_for_cycle(cycle),
        )
        print(f"cycle {cycle}: train loss {float(loss):.4f}", flush=True)
    preds = np.asarray(evaluate(state, eval_videos))[:, 0]
    d_mivit = float(preds.mean())

    print(f"true D = {d_eval}")
    print(f"MSD naive (2D factor 4):     {d_msd_naive:.3f}")
    print(f"MSD confined (1D factor 2):  {d_msd_confined:.3f}")
    print(f"MiViT (trained constrained): {d_mivit:.3f} ± {preds.std():.3f}")

    # --- figure
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(11, 8))
    ax = axes[0, 0]
    geo.draw(ax=ax, show_vertices=True)
    t = np.asarray(eval_trajs[0])
    ax.scatter(t[:, 0], t[:, 1], c=np.arange(len(t)), cmap="autumn", s=6, zorder=5)
    ax.set_title("skeleton + one constrained trajectory")

    ax = axes[0, 1]
    frames = np.asarray(eval_videos[0, :6]).reshape(2, 3, 9, 9)
    ax.imshow(frames.transpose(0, 2, 1, 3).reshape(18, 27), cmap="gray")
    ax.set_title("first 6 rendered frames (molecule 0)")
    ax.axis("off")

    ax = axes[1, 0]
    lags = np.arange(1, 31)
    msd = [float(((eval_trajs[:, lag:] - eval_trajs[:, :-lag]) ** 2).sum(-1).mean())
           for lag in lags]
    ax.plot(lags, msd, "o-", ms=3, label="constrained MSD")
    ax.plot(lags, 2 * d_eval * lags, "--", label="2·D·t (1-D)")
    ax.plot(lags, 4 * d_eval * lags, ":", label="4·D·t (free 2-D)")
    ax.set_xlabel("lag (steps)")
    ax.set_ylabel("MSD (traj-units²)")
    ax.legend()
    ax.set_title("confinement bends the MSD")

    ax = axes[1, 1]
    names = ["MSD naive", "MSD confined", "MiViT"]
    vals = [d_msd_naive, d_msd_confined, d_mivit]
    errs = [0, 0, float(preds.std())]
    ax.bar(names, vals, yerr=errs, color=["#999", "#667", "#3a6"])
    ax.axhline(d_eval, color="k", ls="--", label=f"true D = {d_eval}")
    ax.set_ylabel("estimated D")
    ax.legend()
    ax.set_title("D recovery on confined molecules")

    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main(sys.argv[1:])

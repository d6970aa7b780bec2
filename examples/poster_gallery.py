"""Poster illustration gallery — the example-video/figure renders of
outPoster/posterImages.ipynb and outPoster/VideosIABM.ipynb, regenerated
from this framework's simulator.

The quantitative poster assets (error tables, accuracy-vs-cost) are covered
by `evaluation.plots`/`run_experiment --plots`; this script produces the
ILLUSTRATIVE ones:

1. per-D single-particle trajectory plots, frame-colored
   (VideosIABM.ipynb `plot1ParticleTrajectory`, sub-lengths 5/10/20/30);
2. example rendered frames per D: the 4-variant multi-noise renderer's
   outputs side by side (noise-free HR, noise-free, noisy, normalized —
   posterImages.ipynb frameNoNoise*/frameNoisy* equivalents);
3. a frame-strip "video" per D (first/middle/last frames of one rendered
   sequence — the committable stand-in for play_video animations).

Headless (Agg); writes PNGs under --out (default results/poster_gallery).

Run: python examples/poster_gallery.py [--out results/poster_gallery]
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from moleculardiffusion_mivit_tpu.config import BASELINE_OPTICS, TrainConfig
from moleculardiffusion_mivit_tpu.sim import single_state
from moleculardiffusion_mivit_tpu.sim.render import (
    normalize_images,
    trajectories_to_video,
    trajectories_to_video_multiple_settings,
)

D_VALUES = (1, 3, 5, 7, 10)


def plot_one_particle_trajectory(traj, n_frames, path, max_scale=None):
    """Frame-colored single-particle path (VideosIABM.ipynb
    plot1ParticleTrajectory): each frame's sub-positions share a color from
    a continuous map, so diffusion speed reads as spatial color spread."""
    t = traj.shape[0]
    per = t // n_frames
    cmap = plt.get_cmap("viridis")
    fig, ax = plt.subplots(figsize=(4, 4))
    for f in range(n_frames):
        seg = traj[f * per : (f + 1) * per + 1]
        ax.plot(seg[:, 0], seg[:, 1], color=cmap(f / max(n_frames - 1, 1)), lw=1.2)
    ax.set_aspect("equal")
    if max_scale:
        ax.set_xlim(-max_scale, max_scale)
        ax.set_ylim(-max_scale, max_scale)
    ax.axis("off")
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def save_frame(img, path, vmin=None, vmax=None):
    fig = plt.figure(figsize=(3, 3))
    plt.imshow(np.asarray(img), cmap="gray", vmin=vmin, vmax=vmax)
    plt.axis("off")
    fig.savefig(path, dpi=150, bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/poster_gallery")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    cfg = TrainConfig()
    optics = BASELINE_OPTICS
    p, f = cfg.n_pos_per_frame, cfg.n_frames
    key = jax.random.key(args.seed)
    written = []

    for d in D_VALUES:
        kd = jax.random.fold_in(key, d)
        trajs, _ = single_state(kd, 1, f * p, Ds=(float(d), 0.0))
        traj = np.asarray(trajs[0])

        # 1. frame-colored trajectory at poster sub-lengths
        for sub in (5, 10, 20, 30):
            path = os.path.join(args.out, f"traj_D{d}_f{sub}.png")
            plot_one_particle_trajectory(traj[: sub * p], sub, path)
            written.append(path)

        # 2. the 4-variant multi-noise render of the same trajectory
        scaled = trajs / cfg.traj_div_factor
        variants = trajectories_to_video_multiple_settings(
            jax.random.fold_in(kd, 1), scaled, p, True, optics
        )
        names = ["nonoise_hr", "nonoise", "noisy", "normalized"]
        for name, vid in zip(names, variants):
            img = vid[0, f // 2]
            vmax = float(jnp.max(variants[2])) if name != "normalized" else None
            path = os.path.join(args.out, f"frame_D{d}_{name}.png")
            save_frame(img, path, vmin=0.0 if vmax else None, vmax=vmax)
            written.append(path)

        # 3. frame strip of the normalized training-style render
        vid = trajectories_to_video(jax.random.fold_in(kd, 2), scaled, p, True, optics)
        vid, _ = normalize_images(
            vid, optics.background_intensity[0], optics.background_intensity[1],
            optics.particle_intensity[0] + optics.background_intensity[0],
        )
        frames = np.asarray(vid[0])
        fig, axes = plt.subplots(1, 6, figsize=(12, 2.2))
        for ax, i in zip(axes, np.linspace(0, f - 1, 6).astype(int)):
            ax.imshow(frames[i], cmap="gray")
            ax.set_title(f"frame {i}", fontsize=8)
            ax.axis("off")
        fig.suptitle(f"D = {d}", fontsize=10)
        path = os.path.join(args.out, f"strip_D{d}.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        written.append(path)

    print(f"{len(written)} figures -> {args.out}")


if __name__ == "__main__":
    main()

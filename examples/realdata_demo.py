"""Real-data pipeline demo — the runnable equivalent of the reference's
absent ``Real_data_example.ipynb`` (README.md:56-67 describes it; the
notebook and TIFFs are missing from the snapshot).

Synthesizes a wide-field movie with exposure blur and known ground-truth D,
writes it to TIFF, runs the full pipeline — read → detect (DoG) → track
(Hungarian) → patch → sub-pixel localize — and estimates per-track D two
ways:

- **MSD baseline** on the refined localizations;
- **a trained model** on the extracted patch sequences. The model trains on
  patch-following sequences rendered by the SAME wide-field renderer with
  detection-rounding jitter (particle near patch center ± U(−0.5, 0.5) px),
  D ~ Uniform per sequence — the transfer setup the reference attempted on
  real movies and "was unable to achieve satisfactory results" with
  (ProjectReport, Conclusion). On movies whose physics match the simulator
  this closes the loop: detect → track → patch → model → D.

Run: python examples/realdata_demo.py [--train-cycles 50] [--tif out.tif]
     [--out results/realdata_demo]
"""

import argparse
import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from moleculardiffusion_mivit_tpu.config import ModelConfig, OpticsConfig, TrainConfig
from moleculardiffusion_mivit_tpu.models import GeneralTransformer
from moleculardiffusion_mivit_tpu.realdata import (
    analyze_microscopy_sequence,
    estimate_d_for_tracks,
    extract_particle_patches,
    read_tiff_stack,
    refine_localizations,
    tracks_to_dataframe,
    write_tiff_stack,
)
from moleculardiffusion_mivit_tpu.sim import normalize_images, render_widefield
from moleculardiffusion_mivit_tpu.sim.trajectory import brownian_motion
from moleculardiffusion_mivit_tpu.train.loop import make_train_impls

D_TRUE = 0.3  # px²/frame
N_POS = 10  # sub-positions per frame (exposure blur carries the D signal)
PATCH = 9
BG_MEAN, BG_SIGMA, THEO_MAX = 1000.0, 100.0, 5000.0

OPTICS = OpticsConfig(
    particle_intensity=(4000.0, 200.0),
    psf_division_factor=1.3,
    output_size=PATCH,
    background_intensity=(BG_MEAN, BG_SIGMA),
    poisson_noise=100.0,
    trajectory_unit=-1,  # positions already in px
)


def make_movie(path, n_particles=6, n_frames=25, field=63):
    """Wide-field movie with N_POS sub-positions per frame (motion blur)."""
    rng = np.random.default_rng(0)
    starts = rng.uniform(14, field - 14, size=(n_particles, 1, 2))
    steps = rng.normal(
        0, np.sqrt(2 * D_TRUE / N_POS), size=(n_particles, n_frames * N_POS, 2)
    )
    steps[:, 0] = 0
    trajs = starts + np.cumsum(steps, axis=1)
    movie = np.asarray(
        render_widefield(
            jax.random.key(0), jnp.asarray(trajs, jnp.float32), N_POS, field, OPTICS
        )
    )
    write_tiff_stack(path, movie)
    return movie


def train_patch_model(n_frames, cycles, seqs_per_cycle=256, batch_size=16):
    """Train an image-only transformer on patch-following sequences.

    Per cycle (one jitted program): D ~ U(0.02, 1.0) px²/frame per sequence,
    Brownian sub-positions (same per-substep variance as the movie), each
    frame re-centered to the patch center plus U(−0.5, 0.5) px rounding
    jitter (what detection-centered patch extraction produces), rendered by
    ``render_widefield`` on a PATCH-sized field with the movie's optics, and
    normalized exactly as ``estimate_d_for_tracks`` normalizes real patches.
    """
    cfg = TrainConfig(
        d_max_normalization=1.0,  # D ≤ 1 px²/frame; labels already O(1)
        n_frames=n_frames,
        n_pos_per_frame=N_POS,
        lr=1e-4,
    )
    model = GeneralTransformer(
        ModelConfig(patch_size=PATCH, use_pos_encoding=True), embedding="deep_resnet"
    )
    impls = make_train_impls(model, cfg)
    center = (PATCH - 1) / 2.0

    def generate(key):
        kd, kb, kj, kr = jax.random.split(key, 4)
        n = seqs_per_cycle
        d = jax.random.uniform(kd, (n,), minval=0.02, maxval=1.0)
        sub = brownian_motion(kb, n, n_frames, N_POS, d, dt=1.0)  # (n, F·P, 2)
        seg = sub.reshape(n, n_frames, N_POS, 2)
        seg = seg - seg.mean(axis=2, keepdims=True)  # patch-following
        jitter = jax.random.uniform(kj, (n, n_frames, 1, 2), minval=-0.5, maxval=0.5)
        pos = center + seg + jitter
        videos = jax.vmap(
            lambda k, p: render_widefield(k, p[None], N_POS, PATCH, OPTICS)
        )(jax.random.split(kr, n), pos.reshape(n, n_frames * N_POS, 2))
        videos, _ = normalize_images(videos, BG_MEAN, BG_SIGMA, THEO_MAX)
        return videos, d[:, None]

    @jax.jit
    def cycle(state, key, lr):
        k_gen, k_train = jax.random.split(key)
        videos, labels = generate(k_gen)
        return impls.train_cycle(state, videos, labels, None, k_train, lr, batch_size)

    key = jax.random.key(42)
    ex_videos, _ = jax.jit(generate)(key)
    state = impls.init_state(key, ex_videos[:1])
    for c in range(cycles):
        state, loss = cycle(state, jax.random.fold_in(key, c), jnp.float32(1e-4))
        if (c + 1) % 10 == 0:
            print(f"  train cycle {c + 1}/{cycles}: loss {float(loss):.4f}", flush=True)

    ev = jax.jit(impls.evaluate)

    def predict_fn(videos):  # (B, T, S, S) already normalized by the pipeline
        return ev(state, videos)

    return predict_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-cycles", type=int, default=50)
    ap.add_argument("--tif", type=str, default=None)
    ap.add_argument("--out", type=str, default="results/realdata_demo")
    args = ap.parse_args()

    path = args.tif or tempfile.mktemp(suffix=".tif")
    movie = make_movie(path)
    print(f"synthetic movie (6 particles, D={D_TRUE} px²/frame, blur) → {path}")

    stack = read_tiff_stack(path)
    tracks, detections, dog = analyze_microscopy_sequence(
        stack, min_distance=5, max_linking_distance=8.0, min_track_length=10
    )
    patches = extract_particle_patches(stack, tracks, patch_size=PATCH)
    refined = refine_localizations(tracks, patches, patch_size=PATCH)
    df = tracks_to_dataframe(tracks, patches, patch_size=PATCH)
    print("\nper-track statistics (head):")
    print(df[["x_refined", "y_refined", "psf_size", "displacement"]].head(8))

    lengths = sorted({len(p) for p in tracks.values()})
    print(f"\ntraining patch model ({args.train_cycles} cycles)…", flush=True)
    predict_fn = train_patch_model(max(lengths), args.train_cycles)

    def predict_any_length(videos):
        # model trained at max length; shorter tracks evaluate as-is (the
        # transformer consumes any T ≤ MAX_TOKENS)
        return predict_fn(videos)

    # MSD(τ=1) of exposure-averaged positions = 4·D·(2/3) (Berglund blur
    # factor for full-frame exposure) → D = MSD1 × 0.375
    results = estimate_d_for_tracks(
        tracks, stack, predict_any_length, patch_size=PATCH,
        background_mean=BG_MEAN, background_sigma=BG_SIGMA, theoretical_max=THEO_MAX,
        msd_calibration=0.375, refined_positions=refined,
    )
    d_model = np.asarray([r["d_model"] for r in results.values()])
    d_msd = np.asarray([r["d_msd"] for r in results.values()])
    print(f"\nper-track model D: {np.round(d_model, 3)}")
    print(f"per-track MSD   D: {np.round(d_msd, 3)}")
    summary = {
        "d_true": D_TRUE,
        "n_tracks": len(results),
        "train_cycles": args.train_cycles,
        "model_mean": round(float(d_model.mean()), 3),
        "model_mean_abs_err": round(float(np.abs(d_model - D_TRUE).mean()), 3),
        "msd_mean": round(float(d_msd.mean()), 3),
        "msd_mean_abs_err": round(float(np.abs(d_msd - D_TRUE).mean()), 3),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "realdata_metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

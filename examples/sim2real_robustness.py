"""Sim-to-real robustness: does optics-domain randomization close the
transfer gap the reference died on?

The reference "was unable to achieve satisfactory results on real data"
(ProjectReport, Conclusion; SURVEY.md §6) — its models were trained at one
fixed optics configuration and applied to microscope movies whose PSF,
intensity and noise statistics never match the simulator. This study
measures that failure mode and the standard counter-measure, end to end:

- **fixed** arm: the realdata_demo patch model, trained at the nominal
  optics only (examples/realdata_demo.py protocol — patch-following
  sequences, D ~ U(0.02, 1.0) px²/frame, detection-rounding jitter);
- **randomized** arm: the same model/protocol, but every training cycle
  renders its sequences across a PANEL of optics configurations spanning
  PSF scale × particle intensity × background sigma × Poisson level
  (OpticsConfig is a jit-static, so the randomization is a uniform mixture
  over a static panel — each cycle is still ONE compiled program whose
  sub-batches render under different constants). Normalization always uses
  the NOMINAL camera constants: the analyst never knows the true optics.

Both arms are then scored on synthetic wide-field movies with MISMATCHED
optics through the FULL real-data pipeline — TIFF → DoG detect → Hungarian
track → patch extract → sub-pixel localize → model D per track
(realdata.analyze_microscopy_sequence + estimate_d_for_tracks,
helpersTracking.py:436-510 equivalent) — plus the MSD(τ=1) baseline, which
needs no rendering model and anchors how much of the error is tracking vs
transfer.

Output: results/sim2real/sim2real.json — per test-optics row: mean |D̂ − D|
per arm. The question: does the randomized arm hold its accuracy where the
fixed arm degrades?

Run: python examples/sim2real_robustness.py [--train-cycles 60]
         [--out results/sim2real]
"""

from __future__ import annotations

import argparse
import dataclasses
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
    read_tiff_stack,
    refine_localizations,
    write_tiff_stack,
)
from moleculardiffusion_mivit_tpu.sim import normalize_images, render_widefield
from moleculardiffusion_mivit_tpu.sim.trajectory import brownian_motion
from moleculardiffusion_mivit_tpu.train.loop import make_train_impls

D_TRUE = 0.3  # px²/frame of every test movie
N_POS = 10
PATCH = 9
BG_MEAN, BG_SIGMA, THEO_MAX = 1000.0, 100.0, 5000.0  # analyst-side constants

NOMINAL = OpticsConfig(
    particle_intensity=(4000.0, 200.0),
    psf_division_factor=1.3,
    output_size=PATCH,
    background_intensity=(BG_MEAN, BG_SIGMA),
    poisson_noise=100.0,
    trajectory_unit=-1,
)


def _variant(**kw) -> OpticsConfig:
    return dataclasses.replace(NOMINAL, **kw)


# Domain-randomization panel: 8 corners + center of the optics box the
# microscope could plausibly live in (PSF scale ±25%, intensity ±40%,
# background sigma 0.5-2x, Poisson level 0.5-2x).
RAND_PANEL = [
    NOMINAL,
    _variant(psf_division_factor=1.0, particle_intensity=(2500.0, 200.0)),
    _variant(psf_division_factor=1.0, particle_intensity=(5500.0, 400.0),
             background_intensity=(BG_MEAN, 200.0)),
    _variant(psf_division_factor=1.6, particle_intensity=(2500.0, 100.0),
             poisson_noise=50.0),
    _variant(psf_division_factor=1.6, particle_intensity=(5500.0, 200.0)),
    _variant(background_intensity=(BG_MEAN, 50.0), poisson_noise=200.0),
    _variant(psf_division_factor=1.15, particle_intensity=(3200.0, 200.0),
             background_intensity=(BG_MEAN, 150.0)),
    _variant(psf_division_factor=1.45, particle_intensity=(4800.0, 300.0),
             poisson_noise=70.0),
]

# Held-out TEST optics: nominal + mismatches along each axis, including
# points OUTSIDE the randomization box (psf 1.8, intensity 2000).
TEST_OPTICS = {
    "nominal": NOMINAL,
    "psf_sharp_1.0": _variant(psf_division_factor=1.0),
    "psf_wide_1.6": _variant(psf_division_factor=1.6),
    "psf_wider_1.8": _variant(psf_division_factor=1.8),  # outside the panel
    "dim_2000": _variant(particle_intensity=(2000.0, 150.0)),  # outside
    "bright_5500": _variant(particle_intensity=(5500.0, 300.0)),
    "noisy_bg200_p50": _variant(background_intensity=(BG_MEAN, 200.0), poisson_noise=50.0),
}


def train_patch_model(n_frames: int, cycles: int, optics_panel, seed: int = 42,
                      seqs_per_cycle: int = 256, batch_size: int = 16):
    """realdata_demo's patch-model trainer, generalized to render each
    cycle's sequences across ``optics_panel`` (equal sub-batches per panel
    member, one compiled program). ``optics_panel=[NOMINAL]`` reproduces
    the fixed-optics arm."""
    cfg = TrainConfig(
        d_max_normalization=1.0, n_frames=n_frames, n_pos_per_frame=N_POS, lr=1e-4
    )
    model = GeneralTransformer(
        ModelConfig(patch_size=PATCH, use_pos_encoding=True), embedding="deep_resnet"
    )
    impls = make_train_impls(model, cfg)
    center = (PATCH - 1) / 2.0
    k_panel = len(optics_panel)
    per = seqs_per_cycle // k_panel

    def generate(key):
        kd, kb, kj, kr = jax.random.split(key, 4)
        n = per * k_panel
        d = jax.random.uniform(kd, (n,), minval=0.02, maxval=1.0)
        sub = brownian_motion(kb, n, n_frames, N_POS, d, dt=1.0)
        seg = sub.reshape(n, n_frames, N_POS, 2)
        seg = seg - seg.mean(axis=2, keepdims=True)  # patch-following
        jitter = jax.random.uniform(kj, (n, n_frames, 1, 2), minval=-0.5, maxval=0.5)
        pos = (center + seg + jitter).reshape(n, n_frames * N_POS, 2)
        chunks = []
        for gi, optics in enumerate(optics_panel):
            sl = pos[gi * per : (gi + 1) * per]
            keys = jax.random.split(jax.random.fold_in(kr, gi), per)
            chunks.append(
                jax.vmap(
                    lambda k, p, o=optics: render_widefield(k, p[None], N_POS, PATCH, o)
                )(keys, sl)
            )
        videos = jnp.concatenate(chunks)
        # analyst-side normalization: ALWAYS the nominal camera constants
        videos, _ = normalize_images(videos, BG_MEAN, BG_SIGMA, THEO_MAX)
        return videos, d[:, None]

    @jax.jit
    def cycle(state, key, lr):
        k_gen, k_train = jax.random.split(key)
        videos, labels = generate(k_gen)
        return impls.train_cycle(state, videos, labels, None, k_train, lr, batch_size)

    key = jax.random.key(seed)
    ex_videos, _ = jax.jit(generate)(key)
    state = impls.init_state(key, ex_videos[:1])
    for c in range(cycles):
        state, loss = cycle(state, jax.random.fold_in(key, c), jnp.float32(1e-4))
        if (c + 1) % 20 == 0:
            print(f"  cycle {c + 1}/{cycles}: loss {float(loss):.4f}", flush=True)
    ev = jax.jit(impls.evaluate)
    return lambda videos: ev(state, videos)


def make_movie(path, optics, seed, n_particles=10, n_frames=25, field=63):
    rng = np.random.default_rng(seed)
    starts = rng.uniform(14, field - 14, size=(n_particles, 1, 2))
    steps = rng.normal(
        0, np.sqrt(2 * D_TRUE / N_POS), size=(n_particles, n_frames * N_POS, 2)
    )
    steps[:, 0] = 0
    trajs = starts + np.cumsum(steps, axis=1)
    movie = np.asarray(
        render_widefield(
            jax.random.key(seed), jnp.asarray(trajs, jnp.float32), N_POS, field, optics
        )
    )
    write_tiff_stack(path, movie)


def score_movie(path, predictors):
    """Full pipeline on one movie; returns per-arm mean |D̂ − D_TRUE| and
    the MSD baseline's."""
    stack = read_tiff_stack(path)
    tracks, _, _ = analyze_microscopy_sequence(
        stack, min_distance=5, max_linking_distance=8.0, min_track_length=10
    )
    if not tracks:
        return None
    from moleculardiffusion_mivit_tpu.realdata import extract_particle_patches

    patches = extract_particle_patches(stack, tracks, patch_size=PATCH)
    refined = refine_localizations(tracks, patches, patch_size=PATCH)
    row = {"n_tracks": len(tracks)}
    for arm, predict in predictors.items():
        results = estimate_d_for_tracks(
            tracks, stack, predict, patch_size=PATCH,
            background_mean=BG_MEAN, background_sigma=BG_SIGMA,
            theoretical_max=THEO_MAX, msd_calibration=0.375,
            refined_positions=refined,
        )
        d_model = np.asarray([r["d_model"] for r in results.values()])
        d_msd = np.asarray([r["d_msd"] for r in results.values()])
        row[arm] = round(float(np.abs(d_model - D_TRUE).mean()), 4)
        row.setdefault("msd", round(float(np.abs(d_msd - D_TRUE).mean()), 4))
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train-cycles", type=int, default=60)
    ap.add_argument("--movies-per-optics", type=int, default=3)
    ap.add_argument("--out", default="results/sim2real")
    args = ap.parse_args()

    n_frames = 25
    print(f"training FIXED arm ({args.train_cycles} cycles, nominal optics)...", flush=True)
    fixed = train_patch_model(n_frames, args.train_cycles, [NOMINAL])
    print(f"training RANDOMIZED arm ({args.train_cycles} cycles, "
          f"{len(RAND_PANEL)}-member optics panel)...", flush=True)
    randomized = train_patch_model(n_frames, args.train_cycles, RAND_PANEL)
    predictors = {"fixed": fixed, "randomized": randomized}

    report = {"d_true": D_TRUE, "train_cycles": args.train_cycles,
              "movies_per_optics": args.movies_per_optics, "rows": {}}
    for name, optics in TEST_OPTICS.items():
        accs = []
        for m in range(args.movies_per_optics):
            path = tempfile.mktemp(suffix=".tif")
            make_movie(path, optics, seed=100 + 17 * m)
            row = score_movie(path, predictors)
            os.unlink(path)
            if row:
                accs.append(row)
        if not accs:
            report["rows"][name] = None
            continue
        agg = {
            "n_tracks": int(sum(r["n_tracks"] for r in accs)),
            "fixed_mae": round(float(np.mean([r["fixed"] for r in accs])), 4),
            "randomized_mae": round(float(np.mean([r["randomized"] for r in accs])), 4),
            "msd_mae": round(float(np.mean([r["msd"] for r in accs])), 4),
        }
        report["rows"][name] = agg
        print(name, json.dumps(agg), flush=True)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "sim2real.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"report -> {args.out}/sim2real.json")


if __name__ == "__main__":
    main()

"""Real-data pipeline demo — the runnable equivalent of the reference's
absent ``Real_data_example.ipynb`` (README.md:56-67 describes it; the
notebook and TIFFs are missing from the snapshot).

Synthesizes a wide-field movie with known ground-truth D, writes it to TIFF,
then runs the full pipeline: read → detect (DoG) → track (Hungarian) →
patch → sub-pixel localize → per-track D estimates (trained-model hook +
MSD baseline) → annotated DataFrame.

Run: python examples/realdata_demo.py [output.tif]
"""

import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from moleculardiffusion_mivit_tpu.config import OpticsConfig
from moleculardiffusion_mivit_tpu.realdata import (
    analyze_microscopy_sequence,
    estimate_d_for_tracks,
    extract_particle_patches,
    read_tiff_stack,
    refine_localizations,
    tracks_to_dataframe,
    write_tiff_stack,
)
from moleculardiffusion_mivit_tpu.sim import render_widefield


def main(path=None):
    d_true = 0.3  # px²/frame
    n_particles, n_frames, field = 6, 25, 63
    optics = OpticsConfig(
        particle_intensity=(4000.0, 200.0),
        psf_division_factor=1.3,
        output_size=9,
        background_intensity=(1000.0, 100.0),
        poisson_noise=100.0,
        trajectory_unit=-1,
    )
    rng = np.random.default_rng(0)
    starts = rng.uniform(14, 49, size=(n_particles, 2))
    steps = rng.normal(0, np.sqrt(2 * d_true), size=(n_particles, n_frames, 2))
    steps[:, 0] = 0
    trajs = starts[:, None, :] + np.cumsum(steps, axis=1)
    movie = np.asarray(
        render_widefield(jax.random.key(0), jnp.asarray(trajs, jnp.float32), 1, field, optics)
    )

    path = path or tempfile.mktemp(suffix=".tif")
    write_tiff_stack(path, movie)
    print(f"synthetic movie ({n_particles} particles, D={d_true} px²/frame) → {path}")

    stack = read_tiff_stack(path)
    tracks, detections, dog = analyze_microscopy_sequence(
        stack, min_distance=5, max_linking_distance=8.0, min_track_length=10
    )

    patches = extract_particle_patches(stack, tracks, patch_size=9)
    refined = refine_localizations(tracks, patches, patch_size=9)
    df = tracks_to_dataframe(tracks, patches, patch_size=9)
    print("\nper-track statistics (head):")
    print(df[["x_refined", "y_refined", "psf_size", "displacement"]].head(8))

    def untrained_model(videos):  # plug a trained Experiment.predict here
        return jnp.zeros((videos.shape[0], 1))

    results = estimate_d_for_tracks(
        tracks, stack, untrained_model, patch_size=9,
        background_mean=1000.0, background_sigma=100.0, theoretical_max=5000.0,
        msd_calibration=0.25, refined_positions=refined,
    )
    d_msd = np.asarray([r["d_msd"] for r in results.values()])
    print(f"\nMSD-estimated D per track: {np.round(d_msd, 3)}")
    print(f"mean {d_msd.mean():.3f} vs true {d_true} px²/frame")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

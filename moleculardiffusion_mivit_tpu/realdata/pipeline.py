"""End-to-end real-data workflow: detect → track → patch → localize → infer D.

Parity target: ``analyze_microscopy_sequence`` (helpers/helpersTracking.py:
436-510) plus the per-track inference pattern described in the project
report §3.2 (patches + features fed to the trained models; model-name columns
like D_resnet appear at helpersTracking.py:773) and the MSD baseline.

``estimate_d_for_tracks`` batches same-length tracks so each distinct track
length compiles once, normalizes patches with the training statistics, runs
the trained model, and adds the classical MSD(τ=1) estimate from refined
positions.
"""

from __future__ import annotations

import pickle
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from moleculardiffusion_mivit_tpu.features.msd import d_from_msd_tau1
from moleculardiffusion_mivit_tpu.realdata.patches import extract_particle_patches
from moleculardiffusion_mivit_tpu.realdata.stats import tracks_to_dataframe
from moleculardiffusion_mivit_tpu.realdata.track import track_particles
from moleculardiffusion_mivit_tpu.sim import normalize_images


def analyze_microscopy_sequence(
    image_sequence: np.ndarray,
    sigma1: float = 1.0,
    sigma2: float = 2.0,
    threshold_percentage: float = 0.1,
    min_distance: int = 3,
    max_linking_distance: float = 15.0,
    min_track_length: int = 3,
    verbose: bool = False,
    output_prefix: Optional[str] = None,
):
    """Track particles across a sequence; optionally dump CSV + pickle
    (the reference's save path, helpersTracking.py:498-508).

    Returns ``(tracks, detections, dog_images)``.
    """
    tracks, detections, dog_images = track_particles(
        image_sequence,
        sigma1=sigma1,
        sigma2=sigma2,
        threshold_percentage=threshold_percentage,
        min_distance=min_distance,
        max_linking_distance=max_linking_distance,
        min_track_length=min_track_length,
        verbose=verbose,
    )
    if output_prefix:
        try:
            import pandas as pd

            pd.DataFrame(detections).to_csv(f"{output_prefix}_detections.csv", index=False)
        except ImportError:  # pragma: no cover
            pass
        with open(f"{output_prefix}_tracks.pkl", "wb") as f:
            pickle.dump(tracks, f)
        print(f"Results saved with prefix: {output_prefix}")
    return tracks, detections, dog_images


def estimate_d_for_tracks(
    tracks: Dict[int, List[Tuple[int, float, float]]],
    image_sequence: np.ndarray,
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray],
    patch_size: int = 9,
    background_mean: Optional[float] = None,
    background_sigma: Optional[float] = None,
    theoretical_max: Optional[float] = None,
    msd_calibration: float = 37.5 * 10.0,
    min_frames: int = 3,
    refined_positions: Optional[Dict] = None,
):
    """Per-track D estimates from a trained model + the MSD baseline.

    ``predict_fn(videos (B, T, S, S)) -> (B, 1)`` should return predictions
    already rescaled to physical D units (e.g. ``Experiment.predict`` or the
    ``evaluate`` closure from ``make_train_fns`` — both apply the ×D_max).
    ``msd_calibration`` converts the pixel-domain MSD(τ=1) of refined
    positions to D units (the reference's frame-averaged factor 37.5 × D_max,
    trainSettingsImagesFeatures.py:19-22).

    Returns a dict track_id → {"d_model", "d_msd", "n_frames"}.
    """
    patches = extract_particle_patches(np.asarray(image_sequence), tracks, patch_size)

    # group same-length tracks → one compile per distinct length
    by_length: Dict[int, List[int]] = defaultdict(list)
    for tid, pos in tracks.items():
        if len(pos) >= min_frames:
            by_length[len(pos)].append(tid)

    results: Dict[int, dict] = {}
    for length, tids in sorted(by_length.items()):
        batch = np.stack([patches[t] for t in tids])  # (B, L, S, S)
        norm, _ = normalize_images(
            jnp.asarray(batch), background_mean, background_sigma, theoretical_max
        )
        preds = np.asarray(predict_fn(norm)).reshape(len(tids), -1)
        for bi, tid in enumerate(tids):
            if refined_positions is not None:
                pos = np.asarray(
                    [
                        [
                            refined_positions[(tid, int(f))]["x_refined"],
                            refined_positions[(tid, int(f))]["y_refined"],
                        ]
                        for f, _, _ in tracks[tid]
                    ]
                )
            else:
                pos = np.asarray([[x, y] for _, y, x in tracks[tid]])
            msd1 = float(np.asarray(d_from_msd_tau1(jnp.asarray(pos[None], jnp.float32)))[0])
            results[tid] = {
                "d_model": float(preds[bi].mean()),
                "d_msd": msd1 * msd_calibration,
                "n_frames": length,
            }
    return results


def full_pipeline_dataframe(
    image_sequence: np.ndarray,
    patch_size: int = 9,
    **track_kwargs,
):
    """Convenience: track → patches → annotated DataFrame
    (the reference's tracks_to_dataframe flow)."""
    tracks, detections, dog = analyze_microscopy_sequence(image_sequence, **track_kwargs)
    patches = extract_particle_patches(np.asarray(image_sequence), tracks, patch_size)
    df = tracks_to_dataframe(tracks, patches, patch_size)
    return tracks, patches, df

"""Per-track statistics and the tracks DataFrame.

Parity target: ``tracks_to_dataframe`` / ``compute_displacement``
(helpers/helpersTracking.py:608-681): a DataFrame indexed by
``(track_id, frame)`` with columns nbr_frames, x, y, x_refined, y_refined,
psf_size, max_intensity, displacement, mean_displacement, mean_psf_size,
max_intensity_over_track, mean_max_intensity_over_track,
std_max_intensity_over_track.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from moleculardiffusion_mivit_tpu.realdata.localize import refine_localizations


def compute_displacement(df):
    """Add per-step displacement (first step 0) and per-track aggregates —
    same semantics as helpersTracking.py:608-647. Operates on and returns a
    DataFrame indexed by (track_id, frame)."""
    import pandas as pd

    df = df.reset_index()
    df = df.sort_values(["track_id", "frame"])
    dx = df.groupby("track_id")["x_refined"].diff()
    dy = df.groupby("track_id")["y_refined"].diff()
    df["displacement"] = np.sqrt(dx**2 + dy**2).fillna(0.0)

    grouped = df.groupby("track_id")
    df["mean_displacement"] = df["track_id"].map(grouped["displacement"].mean())
    df["mean_psf_size"] = df["track_id"].map(grouped["psf_size"].mean())
    df["max_intensity_over_track"] = df["track_id"].map(grouped["max_intensity"].max())
    df["mean_max_intensity_over_track"] = df["track_id"].map(grouped["max_intensity"].mean())
    df["std_max_intensity_over_track"] = df["track_id"].map(grouped["max_intensity"].std())
    return df.set_index(["track_id", "frame"]).sort_index()


def tracks_to_dataframe(
    tracks: Dict[int, List[Tuple[int, float, float]]],
    patches: Dict[int, np.ndarray],
    patch_size: int,
):
    """tracks + patches → fully annotated DataFrame (reference column set)."""
    import pandas as pd

    rows = []
    for track_id, positions in tracks.items():
        for frame, y, x in positions:
            rows.append((track_id, int(frame), len(positions), x, y))
    df = pd.DataFrame(rows, columns=["track_id", "frame", "nbr_frames", "x", "y"])
    df = df.set_index(["track_id", "frame"]).sort_index()

    refined = refine_localizations(tracks, patches, patch_size)
    for col in ("x_refined", "y_refined", "psf_size", "max_intensity"):
        df[col] = pd.Series({k: v[col] for k, v in refined.items()})

    return compute_displacement(df)

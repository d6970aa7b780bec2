"""Patch extraction around tracked particle positions.

Parity target: ``extract_particle_patches`` (helpers/helpersTracking.py:
513-550) — odd square patches centered on the rounded track position,
constant (zero) padding at image borders.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def extract_particle_patches(
    image_3d: np.ndarray, tracks: Dict[int, List[Tuple[int, float, float]]], patch_size: int = 7
) -> Dict[int, np.ndarray]:
    """Returns track_id → (n_positions, patch_size, patch_size) float32."""
    assert patch_size % 2 == 1, "patch_size must be an odd number"
    half = patch_size // 2
    stack = np.asarray(image_3d, np.float32)
    padded = np.pad(stack, ((0, 0), (half, half), (half, half)), mode="constant")

    patches: Dict[int, np.ndarray] = {}
    for track_id, positions in tracks.items():
        track_patches = []
        for frame, y, x in positions:
            yi, xi = int(round(y)) + half, int(round(x)) + half
            track_patches.append(
                padded[int(frame), yi - half : yi + half + 1, xi - half : xi + half + 1]
            )
        patches[track_id] = np.stack(track_patches)
    return patches

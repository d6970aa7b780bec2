"""Particle detection: Difference-of-Gaussians + local-maximum peaks.

Parity target: ``detect_particles`` (helpers/helpersTracking.py:12-55) —
DoG with σ1=1, σ2=2, absolute threshold = ``threshold_percentage ·
max(dog)``, and ``skimage.feature.peak_local_max`` with a ``min_distance``
square footprint and ``exclude_border=False``.

TPU-native: the DoG filter and the non-maximum suppression (max-pool
equality test) run as one jitted program over the WHOLE stack at once
(``detect_particles_stack``); only the final variable-length coordinate
extraction happens on host. The reference filters frame-by-frame on CPU.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moleculardiffusion_mivit_tpu.ops.filters import difference_of_gaussians


@functools.partial(jax.jit, static_argnames=("sigma1", "sigma2", "min_distance"))
def _dog_and_peak_mask(
    images: jax.Array,
    sigma1: float,
    sigma2: float,
    threshold_percentage: float,
    min_distance: int,
):
    """(F, H, W) → (dog (F, H, W), peak mask (F, H, W)).

    A pixel is a peak iff it equals the maximum over the
    (2·min_distance+1)² neighborhood and exceeds the per-frame absolute
    threshold (fraction of the frame's DoG maximum, helpersTracking.py:45).
    """
    dog = difference_of_gaussians(images, sigma1, sigma2)
    k = 2 * min_distance + 1
    neighborhood_max = jax.lax.reduce_window(
        dog,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, k, k),
        window_strides=(1, 1, 1),
        padding=((0, 0), (min_distance, min_distance), (min_distance, min_distance)),
    )
    frame_max = jnp.max(dog, axis=(1, 2), keepdims=True)
    threshold = threshold_percentage * frame_max
    mask = (dog >= neighborhood_max) & (dog > threshold)
    return dog, mask


def _mask_to_coords(mask_np: np.ndarray, dog_np: np.ndarray, min_distance: int) -> np.ndarray:
    """Extract (y, x) peak coordinates from a mask, resolving plateau ties
    (several equal-valued pixels within one footprint) by greedy suppression
    in descending intensity order, like peak_local_max."""
    ys, xs = np.nonzero(mask_np)
    if len(ys) == 0:
        return np.zeros((0, 2), np.int64)
    order = np.argsort(-dog_np[ys, xs])
    ys, xs = ys[order], xs[order]
    kept: List[Tuple[int, int]] = []
    for y, x in zip(ys, xs):
        if all(max(abs(y - ky), abs(x - kx)) > min_distance for ky, kx in kept):
            kept.append((int(y), int(x)))
    return np.asarray(kept, np.int64).reshape(-1, 2)


def detect_particles(
    image: np.ndarray,
    sigma1: float = 1.0,
    sigma2: float = 2.0,
    threshold_percentage: float = 0.1,
    min_distance: int = 3,
):
    """Single-frame detection. Returns ``(coords (n, 2) as (y, x), dog)``."""
    dog, mask = _dog_and_peak_mask(
        jnp.asarray(image, jnp.float32)[None], sigma1, sigma2, threshold_percentage, min_distance
    )
    dog_np = np.asarray(dog[0])
    coords = _mask_to_coords(np.asarray(mask[0]), dog_np, min_distance)
    return coords, dog_np


def detect_particles_stack(
    images: np.ndarray,
    sigma1: float = 1.0,
    sigma2: float = 2.0,
    threshold_percentage: float = 0.1,
    min_distance: int = 3,
):
    """Whole-stack detection in one device program.

    Returns ``(coords_per_frame: list of (n_f, 2) arrays, dog (F, H, W))``.
    """
    dog, mask = _dog_and_peak_mask(
        jnp.asarray(images, jnp.float32), sigma1, sigma2, threshold_percentage, min_distance
    )
    dog_np = np.asarray(dog)
    mask_np = np.asarray(mask)
    coords = [
        _mask_to_coords(mask_np[f], dog_np[f], min_distance) for f in range(len(mask_np))
    ]
    return coords, dog_np

"""Sub-pixel localization by symmetric 2-D Gaussian fitting.

Parity target: ``add_refined_localization_to_dataframe``
(helpers/helpersTracking.py:555-605): per-patch ``curve_fit`` of
``offset + A·exp(-((x-x0)²+(y-y0)²)/2σ²)`` with initial guess
(max, center, center, 1.0, min); on failure the integer position is kept
with sentinel σ=10 (:588-592).

TPU-native: all patches across all tracks fit in ONE vmapped projected-LM
program (``ops.curve_fit.fit_gaussian_2d``) instead of a per-patch scipy
loop; a non-finite or absurd fit falls back to the sentinel exactly like the
reference's RuntimeError path.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moleculardiffusion_mivit_tpu.ops.curve_fit import fit_gaussian_2d

FALLBACK_SIGMA = 10.0


def refine_localizations(
    tracks: Dict[int, List[Tuple[int, float, float]]],
    patches: Dict[int, np.ndarray],
    patch_size: int,
):
    """Returns a dict keyed by ``(track_id, frame)`` with refined x/y, PSF
    sigma and max intensity — the same quantities the reference adds as
    DataFrame columns."""
    half = patch_size // 2
    keys, all_patches, int_pos = [], [], []
    for track_id, positions in tracks.items():
        tp = patches[track_id]
        for i, (frame, y_int, x_int) in enumerate(positions):
            keys.append((track_id, int(frame)))
            all_patches.append(tp[i])
            int_pos.append((y_int, x_int))
    if not keys:
        return {}

    stacked = jnp.asarray(np.stack(all_patches), jnp.float32)
    params, costs = jax.jit(jax.vmap(fit_gaussian_2d))(stacked)
    params = np.asarray(params)
    amp, x0, y0, sigma, offset = params.T

    # Failure emulation: the reference's curve_fit raises when it cannot
    # converge; our LM always returns numbers, so treat non-finite or
    # out-of-patch centers / absurd widths as failures.
    bad = (
        ~np.isfinite(params).all(axis=1)
        | (x0 < -patch_size)
        | (x0 > 2 * patch_size)
        | (y0 < -patch_size)
        | (y0 > 2 * patch_size)
        | (np.abs(sigma) > 10 * patch_size)
    )

    out = {}
    for k, (key, (y_int, x_int)) in enumerate(zip(keys, int_pos)):
        if bad[k]:
            out[key] = {
                "x_refined": float(x_int),
                "y_refined": float(y_int),
                "psf_size": FALLBACK_SIGMA,
                "max_intensity": float(np.max(all_patches[k])),
            }
        else:
            out[key] = {
                "x_refined": float(x_int - half + x0[k]),
                "y_refined": float(y_int - half + y0[k]),
                "psf_size": float(abs(sigma[k])),
                "max_intensity": float(np.max(all_patches[k])),
            }
    return out

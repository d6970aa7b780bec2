"""Small, slow numpy oracle implementing the *documented formulas* of the
reference renderer, used only to verify that the fused TPU renderer computes
the same math. Written independently from the formula spec in SURVEY.md §2.1
(splat a unit-peak 2-D Gaussian on the upsampled grid, peak-renormalize by the
grid maximum, accumulate, u×u mean-pool)."""

import numpy as np


def splat_pool_frame(x_hr, y_hr, intensities, sigma_hr, S, u):
    """Naive O(P·(S·u)^2) render of one frame, no noise."""
    grid = S * u
    limit = (grid - 1) // 2
    coords = np.linspace(-limit, limit, grid)
    cx, cy = np.meshgrid(coords, coords)
    hr = np.zeros((grid, grid), np.float64)
    for xc, yc, amp in zip(x_hr, y_hr, intensities):
        g = amp * np.exp(-(((cx - xc) ** 2) + ((cy - yc) ** 2)) / (2 * sigma_hr**2))
        hr += amp / g.max() * g
    # u×u mean pool
    return hr.reshape(S, u, S, u).mean(axis=(1, 3))

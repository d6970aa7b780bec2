"""Separable image filters as fused XLA ops.

Replaces ``scipy.ndimage.gaussian_filter`` (used for DoG detection,
reference helpers/helpersTracking.py:38-41) and ``skimage.filters.gaussian``
(mild smoothing in the multi-noise renderer, helpersGeneration.py:530).
Both upstream implementations are separable 1-D correlations with
``truncate=4.0`` and 'nearest' (edge-replicate) boundary handling — we match
those conventions exactly so filtered outputs agree to float tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Normalized 1-D Gaussian taps, radius ``int(truncate*sigma + 0.5)``
    (the scipy.ndimage convention shared by skimage)."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / float(sigma)) ** 2)
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_filter_2d(images: jax.Array, sigma: float, truncate: float = 4.0) -> jax.Array:
    """Separable Gaussian blur over the last two axes with edge-replicate
    padding; batch axes are arbitrary leading dims."""
    k = jnp.asarray(gaussian_kernel_1d(sigma, truncate))
    radius = (k.shape[0] - 1) // 2
    batch_shape = images.shape[:-2]
    h, w = images.shape[-2:]
    x = images.reshape((-1, h, w)).astype(jnp.float32)

    # Rows (axis -2)
    xp = jnp.pad(x, ((0, 0), (radius, radius), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        xp[:, None], k[::-1][None, None, :, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0]
    # Columns (axis -1)
    xp = jnp.pad(x, ((0, 0), (0, 0), (radius, radius)), mode="edge")
    x = jax.lax.conv_general_dilated(
        xp[:, None], k[::-1][None, None, None, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0]
    return x.reshape(batch_shape + (h, w))


@functools.partial(jax.jit, static_argnames=("sigma1", "sigma2", "truncate"))
def difference_of_gaussians(
    images: jax.Array, sigma1: float = 1.0, sigma2: float = 2.0, truncate: float = 4.0
) -> jax.Array:
    """DoG band-pass: ``gaussian(im, sigma1) - gaussian(im, sigma2)``
    (helpersTracking.py:38-42)."""
    return gaussian_filter_2d(images, sigma1, truncate) - gaussian_filter_2d(
        images, sigma2, truncate
    )

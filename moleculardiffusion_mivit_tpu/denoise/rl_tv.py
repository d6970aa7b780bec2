"""Richardson-Lucy deconvolution with total-variation regularization.

Parity target: helpers/helpersGeneration.py:539-658 — ``tv_gradient`` (:542),
``richardson_lucy_tv`` (:557), iteration-snapshot variant (:571),
``create_gaussian_psf`` (:591), batched tensor wrappers (:603-630) and the
combined render→normalize→deconvolve pipeline ``trajs_to_vid_norm_rl``
(:635-658) used by the Denoising experiment's 7-variant input stack.

TPU-native: FFT convolutions in jnp (replacing ``scipy.signal.fftconvolve``),
the iteration loop as ``lax.scan`` (snapshots gathered by index), and the
(batch, frame) axes vmapped — the reference loops both in Python over numpy
frames. The reference's torch wrapper asserts 9×9 patches; any size works
here.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fft_convolve_same(x: jax.Array, k: jax.Array) -> jax.Array:
    """2-D linear convolution, 'same' mode centered like
    ``scipy.signal.fftconvolve(x, k, mode='same')``."""
    h, w = x.shape
    kh, kw = k.shape
    fh, fw = h + kh - 1, w + kw - 1
    fx = jnp.fft.rfft2(x, (fh, fw))
    fk = jnp.fft.rfft2(k, (fh, fw))
    full = jnp.fft.irfft2(fx * fk, (fh, fw))
    sh, sw = (kh - 1) // 2, (kw - 1) // 2
    return jax.lax.dynamic_slice(full, (sh, sw), (h, w))


def tv_gradient(image: jax.Array) -> jax.Array:
    """Gradient of (anisotropy-smoothed) total variation
    (helpersGeneration.py:542-555)."""
    dx = jnp.diff(image, axis=1, append=image[:, -1:])
    dy = jnp.diff(image, axis=0, append=image[-1:, :])
    eps = 1e-8
    mag = jnp.sqrt(dx * dx + dy * dy + eps)
    dxn = dx / mag
    dyn = dy / mag
    grad = jnp.zeros_like(image)
    grad = grad.at[:, :-1].add(-dxn[:, :-1])
    grad = grad.at[:, 1:].add(dxn[:, :-1])
    grad = grad.at[:-1, :].add(-dyn[:-1, :])
    grad = grad.at[1:, :].add(dyn[:-1, :])
    return grad


def _rl_tv_step(estimate, image, psf, psf_mirror, tv_weight):
    relative_blur = image / (fft_convolve_same(estimate, psf) + 1e-6)
    correction = fft_convolve_same(relative_blur, psf_mirror)
    estimate = estimate * correction
    estimate = estimate - tv_weight * tv_gradient(estimate)
    return jnp.clip(estimate, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("iterations",))
def richardson_lucy_tv(
    image: jax.Array, psf: jax.Array, iterations: int = 20, tv_weight: float = 0.01
) -> jax.Array:
    """RL-TV deconvolution of one frame (helpersGeneration.py:557-569):
    estimate starts at 0.5, multiplicative RL update with mirrored PSF, TV
    gradient step, clip to [0, 1]."""
    image = jnp.clip(jnp.asarray(image, jnp.float32), 1e-6, None)
    psf = jnp.asarray(psf, jnp.float32)
    psf_mirror = psf[::-1, ::-1]
    estimate = jnp.full(image.shape, 0.5, jnp.float32)

    def body(est, _):
        return _rl_tv_step(est, image, psf, psf_mirror, tv_weight), None

    estimate, _ = jax.lax.scan(body, estimate, None, length=iterations)
    return estimate


@functools.partial(jax.jit, static_argnames=("iterations_list",))
def richardson_lucy_tv_iter_list(
    image: jax.Array,
    psf: jax.Array,
    iterations_list: Tuple[int, ...] = (2, 5, 10),
    tv_weight: float = 0.01,
) -> jax.Array:
    """Snapshot variant (helpersGeneration.py:571-587): returns the estimate
    after each iteration index in ``iterations_list`` (0-based loop index,
    like the reference's ``if i in iterations_list``). Shape
    ``(len(iterations_list), H, W)``."""
    image = jnp.clip(jnp.asarray(image, jnp.float32), 1e-6, None)
    psf = jnp.asarray(psf, jnp.float32)
    psf_mirror = psf[::-1, ::-1]
    estimate = jnp.full(image.shape, 0.5, jnp.float32)
    max_iters = iterations_list[-1] + 1

    def body(est, _):
        est = _rl_tv_step(est, image, psf, psf_mirror, tv_weight)
        return est, est

    _, all_estimates = jax.lax.scan(body, estimate, None, length=max_iters)
    return all_estimates[jnp.asarray(iterations_list)]


def create_gaussian_psf(size: int = 9, sigma: float = 1.3) -> np.ndarray:
    """Normalized Gaussian PSF kernel (helpersGeneration.py:591-598)."""
    if size % 2 == 0:
        size += 1
    ax = np.arange(-size // 2 + 1, size // 2 + 1)
    x, y = np.meshgrid(ax, ax)
    psf = np.exp(-(x**2 + y**2) / (2 * sigma**2))
    return (psf / psf.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_iters",))
def apply_rl_tv_batch(
    videos: jax.Array, psf: jax.Array, n_iters: int = 10, tv_weight: float = 0.01
) -> jax.Array:
    """Deconvolve a video batch ``(B, T, H, W)`` (helpersGeneration.py:603-614)."""
    fn = lambda im: richardson_lucy_tv(im, psf, n_iters, tv_weight)
    return jax.vmap(jax.vmap(fn))(videos)


@functools.partial(jax.jit, static_argnames=("iterations_list",))
def apply_rl_tv_iter_list_batch(
    videos: jax.Array,
    psf: jax.Array,
    iterations_list: Tuple[int, ...] = (2, 5, 10),
    tv_weight: float = 0.01,
) -> jax.Array:
    """Snapshot variant over a batch: ``(B, T, H, W)`` →
    ``(B, len(iterations), T, H, W)`` (helpersGeneration.py:616-630)."""
    fn = lambda im: richardson_lucy_tv_iter_list(im, psf, iterations_list, tv_weight)
    out = jax.vmap(jax.vmap(fn))(videos)  # (B, T, n_iter, H, W)
    return jnp.transpose(out, (0, 2, 1, 3, 4))


def trajs_to_vid_norm_rl(
    key: jax.Array,
    trajectories: jax.Array,
    n_pos_per_frame: int,
    center: bool,
    optics,
    rl_iterations: Tuple[int, ...] = (2, 5, 10),
    poisson_index: int = 2,
) -> jax.Array:
    """Render the 4 noise variants, normalize, RL-deconvolve the Poisson arm
    at the snapshot iterations, and concatenate to ``(N, 4+len(iters), F, S,
    S)`` (helpersGeneration.py:635-658; PSF sigma=1 as at :645)."""
    from moleculardiffusion_mivit_tpu.sim import (
        normalize_images,
        trajectories_to_video_multiple_settings,
    )

    bg_mean, bg_sigma = optics.background_intensity
    part_mean = optics.particle_intensity[0]
    psf = jnp.asarray(create_gaussian_psf(sigma=1.0))

    variants = trajectories_to_video_multiple_settings(
        key, trajectories, n_pos_per_frame, center, optics
    )
    videos = jnp.stack(variants, axis=1)  # (N, 4, F, S, S)
    videos, _ = normalize_images(videos, bg_mean, bg_sigma, part_mean + bg_mean)
    vids_rl = apply_rl_tv_iter_list_batch(videos[:, poisson_index], psf, rl_iterations)
    return jnp.concatenate([videos, vids_rl], axis=1)

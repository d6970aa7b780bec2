import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculardiffusion_mivit_tpu.config import OpticsConfig
from moleculardiffusion_mivit_tpu.denoise import (
    apply_rl_tv_iter_list_batch,
    create_gaussian_psf,
    fft_convolve_same,
    richardson_lucy_tv,
    trajs_to_vid_norm_rl,
    tv_gradient,
)


def test_fft_convolve_same_matches_scipy(rng):
    fftconvolve = pytest.importorskip("scipy.signal").fftconvolve
    x = rng.normal(size=(9, 9)).astype(np.float32)
    for ksize in (3, 5, 9):
        k = rng.normal(size=(ksize, ksize)).astype(np.float32)
        ours = np.asarray(fft_convolve_same(jnp.asarray(x), jnp.asarray(k)))
        ref = fftconvolve(x, k, mode="same")
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_tv_gradient_matches_reference_formula(rng):
    im = rng.normal(size=(9, 9)).astype(np.float32)
    ours = np.asarray(tv_gradient(jnp.asarray(im)))
    # independent numpy re-derivation of the documented formula
    dx = np.diff(im, axis=1, append=im[:, -1:])
    dy = np.diff(im, axis=0, append=im[-1:, :])
    mag = np.sqrt(dx**2 + dy**2 + 1e-8)
    dxn, dyn = dx / mag, dy / mag
    grad = np.zeros_like(im)
    grad[:, :-1] -= dxn[:, :-1]
    grad[:, 1:] += dxn[:, :-1]
    grad[:-1, :] -= dyn[:-1, :]
    grad[1:, :] += dyn[:-1, :]
    np.testing.assert_allclose(ours, grad, rtol=1e-4, atol=1e-5)


def test_rl_tv_sharpens_blurred_spot():
    """Deconvolving a blurred spot should concentrate mass toward the peak."""
    psf = jnp.asarray(create_gaussian_psf(size=9, sigma=1.3))
    clean = np.zeros((9, 9), np.float32)
    clean[4, 4] = 1.0
    blurred = np.asarray(fft_convolve_same(jnp.asarray(clean), psf))
    restored = np.asarray(richardson_lucy_tv(jnp.asarray(blurred), psf, iterations=20))
    assert restored[4, 4] > blurred[4, 4]
    assert restored.argmax() == blurred.argmax()


def test_iter_list_snapshots_match_full_runs():
    psf = jnp.asarray(create_gaussian_psf(size=5, sigma=1.0))
    im = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1.0, (9, 9)), jnp.float32)
    videos = im[None, None]
    snaps = np.asarray(apply_rl_tv_iter_list_batch(videos, psf, (2, 5, 10)))
    assert snaps.shape == (1, 3, 1, 9, 9)
    # snapshot at index i equals a full run of i+1 iterations
    for j, it in enumerate((2, 5, 10)):
        full = np.asarray(richardson_lucy_tv(im, psf, iterations=it + 1))
        np.testing.assert_allclose(snaps[0, j, 0], full, rtol=1e-4, atol=1e-5)


def test_trajs_to_vid_norm_rl_seven_variants():
    optics = OpticsConfig(
        particle_intensity=(500.0, 20.0),
        output_size=9,
        background_intensity=(100.0, 10.0),
        poisson_noise=1.0,
        trajectory_unit=100.0,
    )
    trajs = 0.05 * jax.random.normal(jax.random.key(0), (4, 100, 2))
    out = trajs_to_vid_norm_rl(jax.random.key(1), trajs, 10, True, optics)
    assert out.shape == (4, 7, 10, 9, 9)
    assert np.isfinite(np.asarray(out)).all()
    # RL arms are clipped to [0, 1]
    assert np.asarray(out)[:, 4:].min() >= 0.0
    assert np.asarray(out)[:, 4:].max() <= 1.0

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculardiffusion_mivit_tpu.config import BASELINE_OPTICS, OpticsConfig
from moleculardiffusion_mivit_tpu.ops import gaussian_filter_2d
from moleculardiffusion_mivit_tpu.sim import (
    normalize_images,
    render_frames_core,
    trajectories_to_video,
    trajectories_to_video_multiple_settings,
    trajectories_to_video_psf_noise_grid,
)
from tests.reference_oracle import splat_pool_frame


def test_render_core_matches_naive_splat(rng):
    """The separable MXU renderer must equal splat-on-HR-grid + block_reduce
    (including peak renormalization) to float32 tolerance."""
    S, u, P = 9, 5, 10
    sigma = 2.1
    x = rng.uniform(-6, 6, size=P)
    y = rng.uniform(-6, 6, size=P)
    amps = rng.uniform(400, 600, size=P)
    ours = render_frames_core(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32),
        jnp.asarray(amps, jnp.float32),
        sigma,
        S,
        u,
    )
    oracle = splat_pool_frame(x, y, amps, sigma, S, u)
    np.testing.assert_allclose(np.asarray(ours), oracle, rtol=2e-4, atol=1e-3)


def test_render_core_even_grid(rng):
    """output_size*u even → non-unit linspace spacing; must still match."""
    S, u, P = 4, 3, 4
    sigma = 1.5
    x = rng.uniform(-1, 1, size=P)
    y = rng.uniform(-1, 1, size=P)
    amps = rng.uniform(1, 2, size=P)
    ours = render_frames_core(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(amps, jnp.float32), sigma, S, u,
    )
    oracle = splat_pool_frame(x, y, amps, sigma, S, u)
    np.testing.assert_allclose(np.asarray(ours), oracle, rtol=2e-4, atol=1e-5)


def test_render_orientation_rows_are_y():
    """A spot displaced in +y (pre-inversion −y after the video flip) must
    move along the row axis."""
    S, u = 9, 5
    frame = render_frames_core(
        jnp.array([0.0]), jnp.array([10.0]), jnp.array([1.0]), 2.0, S, u
    )
    r, c = np.unravel_index(np.argmax(np.asarray(frame)), (S, S))
    assert c == 4  # x centered
    assert r > 4  # y positive → lower rows (row index grows with +y coordinate)


def test_trajectories_to_video_shapes_and_background():
    key = jax.random.key(0)
    optics = OpticsConfig(
        particle_intensity=(0.0, 0.0),  # no spots → pure background statistics
        output_size=9,
        background_intensity=(100.0, 10.0),
        poisson_noise=-1.0,
        trajectory_unit=100.0,
    )
    trajs = jnp.zeros((64, 300, 2), jnp.float32)
    vids = trajectories_to_video(key, trajs, 10, True, optics)
    assert vids.shape == (64, 30, 9, 9)
    v = np.asarray(vids)
    assert abs(v.mean() - 100.0) < 1.0
    assert v.min() >= 0.0 and v.max() <= 130.0  # clip at bg + 3 sigma
    assert abs(v.std() - 10.0) < 1.0


def test_trajectories_to_video_poisson_multiplicative():
    key = jax.random.key(1)
    optics = OpticsConfig(
        particle_intensity=(0.0, 0.0),
        output_size=9,
        background_intensity=(1000.0, 0.0),
        poisson_noise=100.0,
    )
    vids = np.asarray(
        trajectories_to_video(key, jnp.zeros((32, 100, 2)), 10, False, optics)
    )
    # frame * Pois(100)/100: mean 1000, std 1000/sqrt(100) = 100
    assert abs(vids.mean() - 1000.0) < 5.0
    assert abs(vids.std() - 100.0) < 5.0


def test_trajectories_to_video_spot_statistics():
    """With centering, total added flux ≈ particle_mean per frame (spots sum
    of P draws of N(mu/P, sigma/P)); peak renorm keeps peaks near intensity."""
    key = jax.random.key(2)
    optics = BASELINE_OPTICS.replace(poisson_noise=-1.0, background_intensity=(0.0, 0.0))
    # tiny D so the spot stays centered
    trajs = 1e-4 * jax.random.normal(jax.random.key(3), (128, 300, 2))
    vids = np.asarray(trajectories_to_video(key, trajs, 10, True, optics))
    part_mean = optics.particle_intensity[0]
    # Frame integral over HR grid ≈ sum over pooled grid × u² — compare flux
    # via peak: a static, centered spot has peak ≈ part_mean (peak-renormalized,
    # all sub-spots coincident at grid center).
    peaks = vids.max(axis=(2, 3))
    # The pooled peak is attenuated vs the HR peak by the u×u block average
    # of the Gaussian around its center; compute that factor exactly.
    u = optics.upsampling_factor
    sig = optics.gaussian_sigma_hr
    d = np.arange(u) - (u - 1) / 2
    g1 = np.exp(-(d**2) / (2 * sig**2)).mean()
    attenuation = g1 * g1
    assert abs(peaks.mean() - part_mean * attenuation) / part_mean < 0.03


def test_multiple_settings_variants():
    key = jax.random.key(4)
    optics = OpticsConfig(
        particle_intensity=(500.0, 20.0),
        output_size=9,
        background_intensity=(100.0, 10.0),
        poisson_noise=1.0,
        trajectory_unit=100.0,
    )
    trajs = 0.1 * jax.random.normal(jax.random.key(5), (8, 300, 2))
    no_noise, gauss, poisson, filtered = trajectories_to_video_multiple_settings(
        key, trajs, 10, True, optics
    )
    for v in (no_noise, gauss, poisson, filtered):
        assert v.shape == (8, 30, 9, 9)
    nn, g = np.asarray(no_noise), np.asarray(gauss)
    assert (g - nn).min() >= 0.0  # clipped background is non-negative
    assert abs((g - nn).mean() - 100.0) < 2.0
    # Poisson arm is integer multiples of 1/k (k=1 → integers)
    p = np.asarray(poisson)
    np.testing.assert_allclose(p, np.round(p), atol=1e-5)
    # Gaussian filter preserves mean approximately
    assert abs(np.asarray(filtered).mean() - p.mean()) < 1.0


def test_psf_noise_grid_shapes_and_cascade():
    key = jax.random.key(6)
    optics = OpticsConfig(
        particle_intensity=(5000.0, 500.0),
        psf_division_factor=1.3,
        output_size=9,
        background_intensity=(5000.0, 0.0),
        poisson_noise=100.0,
        trajectory_unit=1200.0,
    )
    trajs = 0.01 * jax.random.normal(jax.random.key(7), (4, 300, 2))
    psf = (2.0, 1.0)
    noise = (0.0, 0.1)
    vids = trajectories_to_video_psf_noise_grid(
        key, trajs, 10, True, optics, psf, noise
    )
    assert vids.shape == (4, 2, 2, 30, 9, 9)
    v = np.asarray(vids)
    # psf_setting divides sigma, so index 0 (setting 2.0) is sharper than
    # index 1 (setting 1.0). Peak renormalization equalizes peaks, so compare
    # spatial spread: the wide PSF puts relatively more mass 2 px off-center.
    prof = v.mean(axis=(0, 3))  # (N_PSF, N_NOISE, S, S)
    sharp, wide = prof[0, 0] - prof[0, 0].min(), prof[1, 0] - prof[1, 0].min()
    assert wide[4, 6] / wide[4, 4] > sharp[4, 6] / sharp[4, 4]
    # Cascade: noisy arm mean ≈ arm0 mean + bg_mean (background added twice
    # relative to clean frame — reference behavior).
    assert v[:, :, 1].mean() > v[:, :, 0].mean() + 4000.0


def test_normalize_images_formula():
    imgs = jnp.asarray(np.linspace(0, 200, 50, dtype=np.float32).reshape(2, 25))
    out, stats = normalize_images(imgs, 100.0, 10.0, 150.0)
    expected = (np.asarray(imgs) - 90.0) / 60.0
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)
    clipped, _ = normalize_images(imgs, 100.0, 10.0, 150.0, clip_image=True)
    assert np.asarray(clipped).min() >= 0.0 and np.asarray(clipped).max() <= 1.5


def test_gaussian_filter_matches_scipy():
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    x = np.random.default_rng(0).normal(size=(3, 17, 13)).astype(np.float32)
    ours = np.asarray(gaussian_filter_2d(jnp.asarray(x), sigma=0.5))
    ref = np.stack(
        [scipy_ndimage.gaussian_filter(im, sigma=0.5, mode="nearest") for im in x]
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_generate_images_legacy():
    from moleculardiffusion_mivit_tpu.sim.render import generate_images_legacy

    key = jax.random.key(0)
    traj = 2.0 * jax.random.normal(jax.random.key(1), (20, 2))
    hr, lr, noisy = generate_images_legacy(
        key, traj, nframes=4, npixel=9, factor_hr=5, nposframe=5,
        fwhm_psf=2.0, pixelsize=1.0, flux=100.0, background=10.0, gaussian_noise=2.0,
    )
    assert hr.shape == (4, 45, 45)
    assert lr.shape == (4, 9, 9)
    assert noisy.shape == (4, 9, 9)
    # lr is the exact block mean of hr
    np.testing.assert_allclose(
        np.asarray(lr), np.asarray(hr).reshape(4, 9, 5, 9, 5).mean(axis=(2, 4)), rtol=1e-5
    )
    # background within the clip range
    delta = np.asarray(noisy) - np.asarray(lr)
    assert delta.min() >= 0.0 and delta.max() <= 16.0 + 1e-5

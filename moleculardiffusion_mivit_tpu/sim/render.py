"""Fluorescence video renderer — fused, batched, on-device.

TPU-native re-design of the reference's hot inner loop
(helpers/helpersGeneration.py:128-350): the reference evaluates a full 2-D
Gaussian on an upsampled ``(S*u, S*u)`` grid per sub-position per frame per
particle on host CPU, peak-renormalizes against the grid maximum, accumulates,
then mean-pools with ``skimage.block_reduce`` and adds noise.

Key algebraic identity exploited here: the 2-D Gaussian on the meshgrid is an
outer product of 1-D Gaussians, and *both* the u×u mean-pooling and the grid
maximum factor over that product:

    pool(g_y ⊗ g_x) = pool(g_y) ⊗ pool(g_x)
    max (g_y ⊗ g_x) = max(g_y) · max(g_x)        (g >= 0)

so a rendered frame (before noise) is

    frame = Σ_p  w_p · pool(g_y_p) ⊗ pool(g_x_p),
    w_p   = intensity_p / (max(g_y_p) · max(g_x_p))     (peak renormalization,
                                                         helpersGeneration.py:303-308)

which is a batched ``(S × P) @ (P × S)`` matmul — MXU work — with only
``O(P · S · u)`` 1-D exponentials (VPU) per frame instead of the reference's
``O(P · S² · u²)``. The result is bit-for-bit the same math as
splat-then-block_reduce, up to float associativity. The whole renderer is a
pure jittable function of a PRNG key, so XLA fuses generation into the
training step and the reference's host→device copy disappears.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.config import OpticsConfig
from moleculardiffusion_mivit_tpu.sim.trajectory import single_state


def hr_grid_coords(output_size: int, upsampling_factor: int) -> jax.Array:
    """High-resolution grid coordinates, reproducing ``gaussian_2d``'s
    ``linspace(-limit, limit, grid_size)`` with ``limit=(grid_size-1)//2``
    (helpersGeneration.py:90-93). Unit spacing iff ``S*u`` is odd."""
    grid = output_size * upsampling_factor
    limit = (grid - 1) // 2
    return jnp.linspace(-float(limit), float(limit), grid, dtype=jnp.float32)


def _pooled_gaussian_1d(
    centers: jax.Array, sigma_hr, output_size: int, upsampling_factor: int
) -> Tuple[jax.Array, jax.Array]:
    """1-D unit-peak Gaussians on the HR grid, mean-pooled by ``u``.

    centers: (..., ) HR-grid coordinates. ``sigma_hr`` may be scalar or
    broadcastable to ``centers``. Returns ``(pooled (..., S), gmax (...,))``.
    """
    coords = hr_grid_coords(output_size, upsampling_factor)
    d = coords - centers[..., None]
    sig = jnp.asarray(sigma_hr, jnp.float32)
    if sig.ndim > 0:
        sig = sig[..., None]  # broadcast against the trailing grid axis
    g = jnp.exp(-(d * d) / (2.0 * sig * sig))
    gmax = jnp.max(g, axis=-1)
    pooled = jnp.mean(
        g.reshape(g.shape[:-1] + (output_size, upsampling_factor)), axis=-1
    )
    return pooled, gmax


@functools.partial(jax.jit, static_argnames=("output_size", "upsampling_factor"))
def _render_frames_xla(
    x_hr: jax.Array,
    y_hr: jax.Array,
    intensities: jax.Array,
    sigma_hr,
    output_size: int,
    upsampling_factor: int,
) -> jax.Array:
    px, mx = _pooled_gaussian_1d(x_hr, sigma_hr, output_size, upsampling_factor)
    py, my = _pooled_gaussian_1d(y_hr, sigma_hr, output_size, upsampling_factor)
    w = intensities / (mx * my)
    # (..., P, S) x (..., P, S) -> (..., S, S): batched MXU matmul. HIGHEST
    # precision keeps full float32 accumulation on TPU (the default would
    # round operands to bfloat16 — a ~0.4% pixel error); these contractions
    # are tiny (S×P @ P×S) so the extra MXU passes are negligible next to the
    # VPU exp work.
    return jnp.einsum(
        "...ps,...pt->...st",
        py * w[..., None],
        px,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


_RENDER_BACKEND = "xla"


def set_render_backend(backend: str) -> None:
    """Select the noise-free frame renderer: ``"xla"`` (default — fastest
    overall, see the RESULTS.md renderer table) or ``"pallas"`` (the
    hand-tuned Mosaic kernel, within ~1.25× of XLA at the flagship 9×9
    size). The pallas backend handles flat/leading-batch inputs with a
    SCALAR sigma at guard-accepted sizes and falls back to XLA otherwise
    (e.g. the PSF-grid experiment's per-PSF sigma axis); it also falls
    back — with a one-time warning — at sizes where the kernel measured
    SLOWER than XLA (13×13 and up: ``ops.pallas_render.pallas_profitable``),
    so selecting it never silently regresses a reference regime. The choice
    binds at
    TRACE time, so switching clears the jit caches — already-traced callers
    (e.g. ``trajectories_to_video``) would otherwise silently keep the
    backend they were traced with. Intended as a once-per-process setup
    call, before building experiments."""
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown render backend {backend!r}")
    global _RENDER_BACKEND
    if backend != _RENDER_BACKEND:
        _RENDER_BACKEND = backend
        jax.clear_caches()


def render_frames_core(
    x_hr: jax.Array,
    y_hr: jax.Array,
    intensities: jax.Array,
    sigma_hr,
    output_size: int,
    upsampling_factor: int,
) -> jax.Array:
    """Render noise-free frames from sub-positions.

    x_hr, y_hr: ``(..., P)`` sub-position coordinates on the HR grid
    (i.e. low-res pixels × upsampling_factor, y already axis-inverted).
    intensities: ``(..., P)`` per-sub-position spot intensities.
    sigma_hr: PSF sigma in HR pixels — scalar, or broadcastable to
    ``(..., P)`` (used by the PSF-grid experiment with a leading PSF axis).

    Returns frames ``(..., S, S)`` with rows = y, columns = x (the reference's
    ``np.meshgrid`` orientation, helpersGeneration.py:93-96). Implements peak
    renormalization exactly: each spot is scaled so its HR-grid maximum equals
    its drawn intensity (helpersGeneration.py:303-308). As in the reference,
    a spot whose footprint has left the grid produces a near-zero maximum and
    a numerically meaningless frame (the reference prints
    "Particle Left the image" and divides anyway).

    Dispatches to the backend chosen by ``set_render_backend`` ("xla"
    default); the pallas kernel takes scalar-sigma batches and falls back
    to XLA for shapes/sizes it does not support.
    """
    if _RENDER_BACKEND == "pallas" and jnp.ndim(sigma_hr) == 0 and x_hr.ndim >= 2:
        from moleculardiffusion_mivit_tpu.ops.pallas_render import (
            pallas_profitable,
            pallas_render_frames,
        )

        if not pallas_profitable(output_size):
            # measured-slower regime (e.g. the Framerate experiment's 13×13
            # patch, 4.4× vs XLA): fall back with a one-time warning instead
            # of silently honoring the backend choice at a regression
            return _render_frames_xla(
                x_hr, y_hr, intensities, sigma_hr, output_size, upsampling_factor
            )
        lead = x_hr.shape[:-1]
        p = x_hr.shape[-1]
        s = output_size
        try:
            flat = pallas_render_frames(
                x_hr.reshape(-1, p),
                y_hr.reshape(-1, p),
                intensities.reshape(-1, p),
                sigma_hr,
                output_size,
                upsampling_factor,
                # Mosaic compiles on TPU only; elsewhere (e.g. the forced-CPU
                # test mesh) the kernel runs in interpret mode
                interpret=jax.default_backend() != "tpu",
            )
            return flat.reshape(lead + (s, s))
        except ValueError:
            pass  # size guard: fall back to the XLA path
    return _render_frames_xla(
        x_hr, y_hr, intensities, sigma_hr, output_size, upsampling_factor
    )


def _prepare_subpositions(
    trajectories: jax.Array,
    n_pos_per_frame: int,
    center: bool,
    optics: OpticsConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Shared preprocessing: y-axis inversion (helpersGeneration.py:197),
    trajectory-unit → pixel conversion (:229-231), framing into
    ``(N, F, P)`` and optional per-frame centering (:291), and scaling to HR
    grid coordinates (:292-293)."""
    n, t, _ = trajectories.shape
    if t % n_pos_per_frame != 0:
        raise ValueError("T is not divisible by n_pos_per_frame")
    n_frames = t // n_pos_per_frame

    trajs = trajectories.astype(jnp.float32)
    trajs = trajs * jnp.array([1.0, -1.0], jnp.float32)  # y inversion
    trajs = trajs * jnp.float32(optics.pixels_per_unit)

    seg = trajs.reshape(n, n_frames, n_pos_per_frame, 2)
    if center:
        seg = seg - jnp.mean(seg, axis=2, keepdims=True)
    seg = seg * jnp.float32(optics.upsampling_factor)
    return seg[..., 0], seg[..., 1]  # x_hr, y_hr each (N, F, P)


def _clipped_background(key, shape, bg_mean: float, bg_std: float) -> jax.Array:
    """``clip(N(mean, std), 0, mean + 3 std)`` additive background
    (helpersGeneration.py:312-313)."""
    noise = jax.random.normal(key, shape, jnp.float32) * jnp.float32(bg_std)
    return jnp.clip(jnp.float32(bg_mean) + noise, 0.0, jnp.float32(bg_mean + 3.0 * bg_std))


def _poisson(key, lam: jax.Array) -> jax.Array:
    return jax.random.poisson(key, lam, lam.shape).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("n_pos_per_frame", "center", "optics")
)
def trajectories_to_video(
    key: jax.Array,
    trajectories: jax.Array,
    n_pos_per_frame: int,
    center: bool = False,
    optics: OpticsConfig = OpticsConfig(),
) -> jax.Array:
    """Trajectories → noisy fluorescence videos, on device.

    Port of the reference pipeline ``trajectories_to_video`` →
    ``trajectory_to_video`` (helpersGeneration.py:128-319) with identical
    sampling semantics:

    - per-sub-position spot intensity ~ N(μ/P, σ/P) (:300), spots only
      rendered when both μ and σ exceed 1e-4 (:299);
    - peak renormalization against the HR-grid maximum (:303-308);
    - u×u mean pooling (:310);
    - additive clipped-Gaussian background (:312-313);
    - multiplicative Poisson noise ``frame · Pois(k)/k`` when k != -1 (:316-317).

    trajectories: ``(N, T, 2)`` in trajectory units.
    Returns ``(N, T // n_pos_per_frame, S, S)`` float32 videos.
    """
    n, t, _ = trajectories.shape
    p = n_pos_per_frame
    n_frames = t // p
    s, u = optics.output_size, optics.upsampling_factor
    part_mean, part_std = optics.particle_intensity
    bg_mean, bg_std = optics.background_intensity

    x_hr, y_hr = _prepare_subpositions(trajectories, p, center, optics)

    k_int, k_bg, k_poi = jax.random.split(key, 3)

    if part_mean > 1e-4 and part_std > 1e-4:
        intensities = part_mean / p + (part_std / p) * jax.random.normal(
            k_int, (n, n_frames, p), jnp.float32
        )
        frames = render_frames_core(x_hr, y_hr, intensities, optics.gaussian_sigma_hr, s, u)
    else:
        frames = jnp.zeros((n, n_frames, s, s), jnp.float32)

    frames = frames + _clipped_background(k_bg, frames.shape, bg_mean, bg_std)

    if optics.poisson_noise != -1:
        k = jnp.float32(optics.poisson_noise)
        mult = _poisson(k_poi, jnp.broadcast_to(k, frames.shape)) / k
        frames = frames * mult
    return frames


@functools.partial(
    jax.jit, static_argnames=("n_pos_per_frame", "center", "optics", "filter_sigma")
)
def trajectories_to_video_multiple_settings(
    key: jax.Array,
    trajectories: jax.Array,
    n_pos_per_frame: int,
    center: bool = False,
    optics: OpticsConfig = OpticsConfig(),
    filter_sigma: float = 0.5,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Render four aligned noise variants of each video (Denoising experiment).

    Port of ``trajectories_to_video_multiple_settings`` /
    ``trajectory_to_mult_settings`` (helpersGeneration.py:422-537):
    per-*frame* intensity draw N(μ, σ) split evenly over sub-positions
    (:506-513); outputs (no_noise, +gaussian bg, shot-noise
    ``Pois(frame·k)/k`` (:529), Gaussian-filtered σ=0.5 (:530)).
    """
    n, t, _ = trajectories.shape
    p = n_pos_per_frame
    n_frames = t // p
    s, u = optics.output_size, optics.upsampling_factor
    part_mean, part_std = optics.particle_intensity
    bg_mean, bg_std = optics.background_intensity

    x_hr, y_hr = _prepare_subpositions(trajectories, p, center, optics)
    k_int, k_bg, k_poi = jax.random.split(key, 3)

    if part_mean > 1e-4 and part_std > 1e-4:
        frame_intensity = part_mean + part_std * jax.random.normal(
            k_int, (n, n_frames), jnp.float32
        )
        intensities = jnp.broadcast_to((frame_intensity / p)[..., None], (n, n_frames, p))
        no_noise = render_frames_core(x_hr, y_hr, intensities, optics.gaussian_sigma_hr, s, u)
    else:
        no_noise = jnp.zeros((n, n_frames, s, s), jnp.float32)

    gauss = no_noise + _clipped_background(k_bg, no_noise.shape, bg_mean, bg_std)
    k = jnp.float32(optics.poisson_noise)
    poisson = _poisson(k_poi, jnp.maximum(gauss, 0.0) * k) / k
    from moleculardiffusion_mivit_tpu.ops.filters import gaussian_filter_2d

    filtered = gaussian_filter_2d(poisson, sigma=filter_sigma)
    return no_noise, gauss, poisson, filtered


@functools.partial(
    jax.jit,
    static_argnames=("n_pos_per_frame", "center", "optics", "psf_settings", "noise_settings"),
)
def trajectories_to_video_psf_noise_grid(
    key: jax.Array,
    trajectories: jax.Array,
    n_pos_per_frame: int,
    center: bool = False,
    optics: OpticsConfig = OpticsConfig(),
    psf_settings: Tuple[float, ...] = (2.0, 1.75, 1.5, 1.25, 1.0),
    noise_settings: Tuple[float, ...] = (0.0, 1 / 50, 1 / 25, 1 / 20, 1 / 10, 1 / 5),
) -> jax.Array:
    """PSF-size × noise-level grid renderer (the published PSFNoise sweep).

    Port of ``trajs_to_vid_psf_noise`` / ``traj_to_vid_psf_noise``
    (Experiments/PSFNoise/trainSettingsPSFNoise.py:196-309): one spot
    accumulation per PSF scale (sigma / psf_setting), per-frame intensity
    draw shared across the grid, background std = ``particle_mean · noise``,
    shot noise ``Pois(frame·k)/k``.

    NOTE (reference behavior reproduced deliberately): the reference stores
    the clean pooled frame in the noise-0 slot, then *overwrites* it in the
    first iteration of the noise loop and uses the already-noised slot-0
    frame as the base for every other noise level (:299-305). So the
    noise-0 arm is ``Pois((clean + bg_mean)·k)/k`` and arms j>0 are
    ``Pois((arm0 + clip(N(bg, μ·noise_j)))·k)/k`` — a cascade, not
    independent noisings of the clean frame. All published grid numbers were
    produced this way; see PARITY.md.

    NOTE: the PSFNoise settings module recomputes ``fwhm_psf`` *without* the
    psf_division_factor (trainSettingsPSFNoise.py:247 vs :75) — the division
    by ``PSF_Settings`` happens per grid cell instead. We therefore use
    ``optics.replace(psf_division_factor=1).gaussian_sigma_hr`` here.

    Returns ``(N, N_PSF, N_NOISE, F, S, S)`` float32.
    """
    n, t, _ = trajectories.shape
    p = n_pos_per_frame
    n_frames = t // p
    s, u = optics.output_size, optics.upsampling_factor
    part_mean, part_std = optics.particle_intensity
    bg_mean = optics.background_intensity[0]
    n_psf, n_noise = len(psf_settings), len(noise_settings)

    base_sigma = optics.replace(psf_division_factor=1.0).gaussian_sigma_hr
    sigmas = jnp.asarray(
        [base_sigma / ps for ps in psf_settings], jnp.float32
    )  # (N_PSF,)

    x_hr, y_hr = _prepare_subpositions(trajectories, p, center, optics)
    k_int, k_bg, k_poi0, k_poi = jax.random.split(key, 4)

    if part_mean > 1e-4 and part_std > 1e-4:
        frame_intensity = part_mean + part_std * jax.random.normal(
            k_int, (n, n_frames), jnp.float32
        )
        intensities = jnp.broadcast_to((frame_intensity / p)[..., None], (n, n_frames, p))
        # Broadcast a PSF axis: sigma (N_PSF, 1, 1, 1) against (N, F, P).
        clean = render_frames_core(
            x_hr[None],
            y_hr[None],
            intensities[None],
            sigmas[:, None, None, None],
            s,
            u,
        )  # (N_PSF, N, F, S, S)
    else:
        clean = jnp.zeros((n_psf, n, n_frames, s, s), jnp.float32)

    kk = jnp.float32(optics.poisson_noise)
    # Noise-0 arm: bg_std = 0 → constant bg_mean offset, then shot noise.
    arm0 = _poisson(k_poi0, jnp.maximum(clean + jnp.float32(bg_mean), 0.0) * kk) / kk

    arms = [arm0]
    for j in range(1, n_noise):
        bg_std = part_mean * noise_settings[j]
        kb = jax.random.fold_in(k_bg, j)
        kp = jax.random.fold_in(k_poi, j)
        noised = arm0 + _clipped_background(kb, arm0.shape, bg_mean, bg_std)
        arms.append(_poisson(kp, jnp.maximum(noised, 0.0) * kk) / kk)

    grid = jnp.stack(arms, axis=1)  # (N_PSF, N_NOISE, N, F, S, S)
    return jnp.transpose(grid, (2, 0, 1, 3, 4, 5))


@functools.partial(
    jax.jit, static_argnames=("nframes", "npixel", "factor_hr", "nposframe")
)
def generate_images_legacy(
    key: jax.Array,
    trajectory: jax.Array,
    nframes: int,
    npixel: int,
    factor_hr: int,
    nposframe: int,
    fwhm_psf: float,
    pixelsize: float,
    flux: float,
    background: float,
    gaussian_noise: float,
):
    """Legacy IABM image generator (helpersGeneration.py:101-124).

    Differences vs the main renderer, preserved: sigma = ``2.35·fwhm/pixel``
    (the constant multiplies rather than divides — reference line 117), no
    per-spot intensity draw (constant ``flux``), NO peak renormalization,
    and clipped Gaussian background only. Returns
    ``(frame_hr, frame_lr, frame_noisy)`` like the reference.
    """
    seg = trajectory[: nframes * nposframe].reshape(nframes, nposframe, 2)
    x_hr = seg[..., 0]
    y_hr = seg[..., 1]
    sigma = 2.35 * fwhm_psf / pixelsize
    grid = npixel * factor_hr

    coords = hr_grid_coords(npixel, factor_hr)
    gx = jnp.exp(-((coords - x_hr[..., None]) ** 2) / (2.0 * sigma**2))
    gy = jnp.exp(-((coords - y_hr[..., None]) ** 2) / (2.0 * sigma**2))
    frame_hr = jnp.einsum(
        "fps,fpt->fst", flux * gy, gx,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    frame_lr = jnp.mean(
        frame_hr.reshape(nframes, npixel, factor_hr, npixel, factor_hr), axis=(2, 4)
    )
    noise = jax.random.normal(key, frame_lr.shape, jnp.float32) * gaussian_noise
    frame_noisy = frame_lr + jnp.clip(
        background + noise, 0.0, background + 3.0 * gaussian_noise
    )
    return frame_hr, frame_lr, frame_noisy


@functools.partial(jax.jit, static_argnames=("n_pos_per_frame", "field_size", "optics"))
def render_widefield(
    key: jax.Array,
    trajectories_px: jax.Array,
    n_pos_per_frame: int = 1,
    field_size: int = 63,
    optics: OpticsConfig = OpticsConfig(),
) -> jax.Array:
    """Render MULTIPLE particles into one shared field of view.

    The reference only renders per-particle patches (its real wide-field
    movies come from the microscope); this utility synthesizes full-frame
    movies for the detect→track→localize pipeline's integration tests and
    demos, with the same PSF/peak-renormalization/background/Poisson model
    as ``trajectories_to_video``.

    trajectories_px: ``(K, T, 2)`` absolute (x, y) pixel positions (no unit
    conversion, no y-inversion — positions are already in image coordinates
    with y = row). Returns ``(T // n_pos_per_frame, field_size, field_size)``.
    """
    k_particles, t, _ = trajectories_px.shape
    p = n_pos_per_frame
    n_frames = t // p
    s, u = field_size, optics.upsampling_factor
    part_mean, part_std = optics.particle_intensity
    bg_mean, bg_std = optics.background_intensity

    grid = s * u
    limit = (grid - 1) // 2
    # absolute pixel position -> HR grid coordinate (center of the u-cell)
    def to_hr(pos):
        return pos * u + (u - 1) / 2.0 - limit

    seg = trajectories_px.reshape(k_particles, n_frames, p, 2)
    x_hr = to_hr(seg[..., 0]).transpose(1, 0, 2).reshape(n_frames, k_particles * p)
    y_hr = to_hr(seg[..., 1]).transpose(1, 0, 2).reshape(n_frames, k_particles * p)

    k_int, k_bg, k_poi = jax.random.split(key, 3)
    intensities = part_mean / p + (part_std / p) * jax.random.normal(
        k_int, (n_frames, k_particles * p), jnp.float32
    )
    frames = render_frames_core(x_hr, y_hr, intensities, optics.gaussian_sigma_hr, s, u)
    frames = frames + _clipped_background(k_bg, frames.shape, bg_mean, bg_std)
    if optics.poisson_noise != -1:
        kk = jnp.float32(optics.poisson_noise)
        frames = frames * _poisson(k_poi, jnp.broadcast_to(kk, frames.shape)) / kk
    return frames


def normalize_images(
    images: jax.Array,
    background_mean: Optional[float] = None,
    background_sigma: Optional[float] = None,
    theoretical_max: Optional[float] = None,
    clip_image: bool = False,
):
    """``(im - (bg_mean - bg_sigma)) / (theo_max - (bg_mean - bg_sigma))``
    with optional clip to [0, 1.5] (helpersGeneration.py:356-400). Call sites
    pass ``theoretical_max = particle_mean + background_mean``.

    Returns ``(normalized, (bg_mean, bg_sigma, theo_max))``.
    """
    if background_mean is None:
        background_mean = jnp.mean(images)
    if background_sigma is None:
        background_sigma = jnp.std(images)
    if theoretical_max is None:
        theoretical_max = jnp.max(images)
    low = background_mean - background_sigma
    denom = theoretical_max - low
    normalized = (images - low) / denom
    if clip_image:
        normalized = jnp.clip(normalized, 0.0, 1.5)
    return normalized, (background_mean, background_sigma, theoretical_max)


def generate_traj_and_videos_brownian(
    key: jax.Array,
    Ds: Tuple[float, float],
    n_particles: int,
    n_images: int,
    n_pos_per_frame: int,
    optics: OpticsConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Simulate + render in one call (helpersGeneration.py:402-414): returns
    ``(videos (N, F, S, S), D labels (N,))`` with per-frame centering on."""
    k_sim, k_render = jax.random.split(key)
    trajs, labels = single_state(k_sim, n_particles, n_images * n_pos_per_frame, Ds, alphas=1)
    videos = trajectories_to_video(k_render, trajs, n_pos_per_frame, True, optics)
    return videos, labels[:, 0, 1]

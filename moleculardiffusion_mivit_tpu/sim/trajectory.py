"""On-device trajectory simulators.

TPU-native replacements for the reference's host-side generators:

- ``brownian_motion``: the in-repo Gaussian random walk
  (reference helpers/helpersGeneration.py:9-45).
- ``single_state``: the ``andi_datasets.models_phenom().single_state`` call
  used by every training script (e.g. tests/train_tests/trainModels.py:117-121)
  — per-particle D drawn from a truncated normal, α-controlled fractional
  Brownian motion, labels ``(alpha, D, state)``.
- ``fractional_gaussian_noise``: circulant-embedding (Davies-Harte) fGn,
  replacing the ``fbm`` / ``stochastic`` pip deps used by the constrained
  mitochondria simulations
  (Experiments/mitochondria_simulation/mitochnodria.py:433-475).

Everything is a pure function of a PRNG key with static shapes, so it can be
jitted and fused directly into the training step (the reference generates on
host CPU with global numpy RNG and copies to the accelerator every batch).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


def brownian_motion(
    key: jax.Array,
    nparticles: int,
    nframes: int,
    nposframe: int,
    D: Union[float, jax.Array],
    dt: float,
    start_at_zero: bool = False,
    drift: Optional[Union[Tuple[float, float], jax.Array]] = None,
) -> jax.Array:
    """Brownian random walk with per-step sigma ``sqrt(2*D*dt/nposframe)``.

    Mirrors helpers/helpersGeneration.py:9-45: steps are iid normal in x/y and
    positions are the cumulative sum (no origin prepended unless
    ``start_at_zero``, which zeroes the first step as the reference does).

    ``D`` may be a scalar or a per-particle array of shape ``(nparticles,)``.
    ``drift`` is an optional constant velocity ``(vx, vy)`` in trajectory
    units per unit time (per-particle ``(nparticles, 2)`` also accepted) —
    each sub-step adds ``drift * dt / nposframe``, the directional-motion
    variant the reference explores in
    tests/Simulator_tests/AnDi-Directional_Tests.ipynb.

    Returns ``(nparticles, nframes*nposframe, 2)`` float32 positions.
    """
    num_steps = nframes * nposframe
    sigma = jnp.sqrt(2.0 * jnp.asarray(D, jnp.float32) * dt / nposframe)
    sigma = jnp.broadcast_to(sigma, (nparticles,))[:, None, None]
    steps = jax.random.normal(key, (nparticles, num_steps, 2), jnp.float32) * sigma
    if drift is not None:
        v = jnp.broadcast_to(jnp.asarray(drift, jnp.float32), (nparticles, 2))
        steps = steps + v[:, None, :] * (dt / nposframe)
    if start_at_zero:
        # zero the first step LAST so position[0] == (0, 0) also under drift
        steps = steps.at[:, 0, :].set(0.0)
    return jnp.cumsum(steps, axis=1)


def average_trajectories_frames(trajectories: jax.Array, n_pos_frame: int) -> jax.Array:
    """Average ``n_pos_frame`` consecutive sub-positions into one per-frame
    position (camera exposure averaging; helpers/helpersGeneration.py:48-74).

    ``trajectories``: ``(N, T, 2)`` → ``(N, T // n_pos_frame, 2)``.
    """
    n, t, d = trajectories.shape
    n_full = t // n_pos_frame
    reshaped = trajectories[:, : n_full * n_pos_frame].reshape(n, n_full, n_pos_frame, d)
    return jnp.mean(reshaped, axis=2)


def _truncated_normal_at_zero(key: jax.Array, mean, sigma, shape) -> jax.Array:
    """Sample N(mean, sigma^2) conditioned on being >= 0.

    Equivalent in distribution to the redraw loop the andi-datasets simulator
    uses to keep sampled D (and alpha) inside physical bounds. When sigma==0
    this degenerates to the constant mean.
    """
    mean = jnp.asarray(mean, jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32)
    safe_sigma = jnp.where(sigma > 0, sigma, 1.0)
    lower = -mean / safe_sigma
    tn = jax.random.truncated_normal(key, lower, jnp.inf, shape, jnp.float32)
    sampled = mean + safe_sigma * tn
    return jnp.where(sigma > 0, sampled, jnp.broadcast_to(mean, shape))


def fractional_gaussian_noise(
    key: jax.Array, hurst: Union[float, jax.Array], n: int, batch: int = 1
) -> jax.Array:
    """Fractional Gaussian noise via circulant embedding (Davies-Harte).

    Generates ``batch`` independent length-``n`` fGn series with Hurst
    exponent ``hurst`` (H = alpha/2), unit time step and unit variance,
    replacing ``fbm.fgn`` (Davies-Harte backend) used by the reference's
    mitochondria simulation (mitochnodria.py:433-475).

    ``hurst`` may be scalar or shape ``(batch,)``.

    Implementation: the autocovariance of fGn,
    ``gamma(k) = 0.5*(|k+1|^{2H} - 2|k|^{2H} + |k-1|^{2H})``,
    is embedded in a circulant matrix of size ``2n``; its eigenvalues are the
    real FFT of the first row. Complex Gaussian noise shaped by
    ``sqrt(eigenvalues / (4n))`` and inverse-FFT'd yields exact samples.
    Eigenvalues are clamped at 0 (they are non-negative for H in (0,1) up to
    roundoff), matching the standard Davies-Harte validity condition.
    """
    hurst = jnp.broadcast_to(jnp.asarray(hurst, jnp.float32), (batch,))
    m = 2 * n

    k = jnp.arange(n + 1, dtype=jnp.float32)
    two_h = (2.0 * hurst)[:, None]
    gamma = 0.5 * (
        jnp.abs(k + 1.0) ** two_h - 2.0 * jnp.abs(k) ** two_h + jnp.abs(k - 1.0) ** two_h
    )  # (batch, n+1)
    # First row of the circulant embedding: [g0..gn, g_{n-1}..g1]
    row = jnp.concatenate([gamma, gamma[:, 1:-1][:, ::-1]], axis=1)  # (batch, 2n)
    eig = jnp.fft.fft(row, axis=1).real
    eig = jnp.maximum(eig, 0.0)

    kr, ki = jax.random.split(key)
    zr = jax.random.normal(kr, (batch, m), jnp.float32)
    zi = jax.random.normal(ki, (batch, m), jnp.float32)
    z = zr + 1j * zi
    # Re(F diag(sqrt(λ/m)) ξ) with ξ complex standard normal has covariance
    # exactly the circulant embedding (the real part halves the 2λ/m factor).
    coeff = jnp.sqrt(eig / m).astype(jnp.complex64)
    samples = jnp.fft.fft(coeff * z, axis=1)[:, :n].real
    return samples


def fbm_trajectories(
    key: jax.Array,
    nparticles: int,
    num_steps: int,
    alpha: Union[float, jax.Array],
    D: Union[float, jax.Array],
    dt: float = 1.0,
) -> jax.Array:
    """2-D fractional Brownian motion with per-step displacement scale
    ``sqrt(2*D*dt)`` (andi-datasets ``disp_fbm`` convention: displacements are
    fGn with std ``sqrt(2*D*dt)`` at every alpha).

    Returns ``(nparticles, num_steps, 2)`` positions starting at the first
    displacement (cumulative sum, no prepended origin — matching the
    reference's in-repo generator convention).
    """
    alpha = jnp.broadcast_to(jnp.asarray(alpha, jnp.float32), (nparticles,))
    D = jnp.broadcast_to(jnp.asarray(D, jnp.float32), (nparticles,))
    hurst = alpha / 2.0
    kx, ky = jax.random.split(key)
    disp_x = fractional_gaussian_noise(kx, hurst, num_steps, nparticles)
    disp_y = fractional_gaussian_noise(ky, hurst, num_steps, nparticles)
    scale = jnp.sqrt(2.0 * D * dt)[:, None]
    disp = jnp.stack([disp_x * scale, disp_y * scale], axis=-1)
    return jnp.cumsum(disp, axis=1)


def reflect_into_box(positions: jax.Array, L: Union[float, jax.Array]) -> jax.Array:
    """Fold free positions into ``[0, L]`` with reflecting boundaries.

    The triangular-wave map ``L - |mod(x, 2L) - L|`` is the reflection map
    that constructs a reflected process from an unconstrained one — exact in
    distribution for Brownian motion, and the same discrete-time treatment
    the andi-datasets simulator applies when ``single_state`` is given a
    finite box size ``L`` (the reference always passes ``L=0`` = free,
    tests/train_tests/trainModels.py:117-121).
    """
    L = jnp.asarray(L, jnp.float32)
    return L - jnp.abs(jnp.mod(positions, 2.0 * L) - L)


@functools.partial(jax.jit, static_argnames=("n", "t", "pure_brownian", "confined"))
def _single_state_impl(
    key, n, t, d_mean, d_sigma, a_mean, a_sigma, pure_brownian, drift, L, confined
):
    kd, ka, kt, k0 = jax.random.split(key, 4)
    ds = _truncated_normal_at_zero(kd, d_mean, d_sigma, (n,))
    alphas = jnp.clip(_truncated_normal_at_zero(ka, a_mean, a_sigma, (n,)), 0.0, 2.0)
    if pure_brownian:
        sigma = jnp.sqrt(2.0 * ds)[:, None, None]
        steps = jax.random.normal(kt, (n, t, 2), jnp.float32) * sigma
        trajs = jnp.cumsum(steps, axis=1)
    else:
        trajs = fbm_trajectories(kt, n, t, alphas, ds)
    # constant-velocity drift: position at step i (time i+1, no prepended
    # origin) advances by drift*(i+1)
    times = jnp.arange(1, t + 1, dtype=jnp.float32)
    trajs = trajs + drift[None, None, :] * times[None, :, None]
    if confined:
        # uniform random start inside the box, then reflecting boundaries
        start = jax.random.uniform(k0, (n, 1, 2), jnp.float32, 0.0, L)
        trajs = reflect_into_box(trajs + start, L)
    labels = jnp.stack(
        [
            jnp.broadcast_to(alphas[:, None], (n, t)),
            jnp.broadcast_to(ds[:, None], (n, t)),
            jnp.zeros((n, t), jnp.float32),  # state 0 = free diffusion
        ],
        axis=-1,
    )
    return trajs, labels


def single_state(
    key: jax.Array,
    N: int,
    T: int,
    Ds: Union[float, Tuple[float, float]],
    alphas: Union[float, Tuple[float, float]] = 1.0,
    drift: Optional[Tuple[float, float]] = None,
    L: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """TPU-native equivalent of ``models_phenom().single_state``.

    Per-particle diffusion coefficient D ~ N(mean, sigma) truncated at 0 when
    ``Ds=(mean, sigma)`` (scalar → constant); same for ``alphas`` (clipped to
    [0, 2]). ``alphas == 1`` takes a pure-Brownian fast path (iid normal
    steps); otherwise displacements are fGn with Hurst α/2. Labels are
    ``(alpha, D, state)`` per timestep, as the andi simulator returns
    (see tests/Simulator_tests/AnDi-Tests.ipynb cell 2 in the reference).

    ``drift`` adds an optional constant velocity ``(vx, vy)`` in trajectory
    units per step — the directional-motion variant the reference explores
    in tests/Simulator_tests/AnDi-Directional_Tests.ipynb.

    ``L`` is the andi-datasets confinement box size: ``L > 0`` starts each
    particle uniformly inside ``[0, L]^2`` and applies reflecting boundaries
    (``reflect_into_box``); ``L == 0`` (the reference's only usage,
    trainModels.py:118) means free diffusion. Combining ``drift`` with
    ``L > 0`` raises: the whole-trajectory triangle-wave fold is
    distribution-exact only for symmetric (driftless) increments — drifted
    increments need stepwise reflection to produce the correct
    wall-accumulating stationary distribution, which this generator does
    not implement.

    Returns ``trajs (N, T, 2)``, ``labels (N, T, 3)`` — note: already in the
    particle-major layout the reference obtains by transposing
    (trainModels.py:123-124).
    """
    def _pair(v):
        return (float(v[0]), float(v[1])) if isinstance(v, (tuple, list)) else (float(v), 0.0)

    d_mean, d_sigma = _pair(Ds)
    a_mean, a_sigma = _pair(alphas)
    pure_brownian = float(a_mean) == 1.0 and float(a_sigma) == 0.0
    if drift is not None and float(L) > 0.0 and any(float(v) != 0.0 for v in drift):
        raise ValueError(
            "drift combined with confinement (L > 0) is unsupported: the "
            "post-hoc triangle-wave fold is only exact for driftless "
            "increments (see docstring)"
        )
    drift_vec = jnp.zeros(2, jnp.float32) if drift is None else jnp.asarray(drift, jnp.float32)
    return _single_state_impl(
        key,
        N,
        T,
        jnp.float32(d_mean),
        jnp.float32(d_sigma),
        jnp.float32(a_mean),
        jnp.float32(a_sigma),
        pure_brownian,
        drift_vec,
        jnp.float32(L),
        float(L) > 0.0,
    )

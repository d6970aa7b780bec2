"""Mean-square-displacement estimators (helpers/helpersMSD.py).

All estimators are closed-form XLA ops over static-shape lag matrices, vmapped
across particles. The reference loops lags in Python per call; here the lag
dimension is a single masked reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def mean_square_displacements(trajectories: jax.Array) -> jax.Array:
    """Per-lag MSD for a batch of trajectories (helpersMSD.py:29-54).

    trajectories ``(N, T, 2)`` → msd ``(N, T)`` with ``msd[:, 0] = 0`` and
    ``msd[:, tau] = mean_t |x(t+tau) - x(t)|²``.
    """
    trajs = jnp.asarray(trajectories, jnp.float32)
    n, t, _ = trajs.shape

    def one_lag(tau):
        # displacement at lag tau with a validity mask over start times
        idx = jnp.arange(t)
        rolled = jnp.roll(trajs, -tau, axis=1)
        disp2 = jnp.sum((rolled - trajs) ** 2, axis=2)  # (N, T)
        valid = (idx < (t - tau)).astype(jnp.float32)
        return jnp.sum(disp2 * valid, axis=1) / jnp.maximum(t - tau, 1)

    taus = jnp.arange(1, t)
    msd_tail = jax.vmap(one_lag, out_axes=1)(taus)  # (N, T-1)
    return jnp.concatenate([jnp.zeros((n, 1), jnp.float32), msd_tail], axis=1)


def mean_square_displacement(trajectory: jax.Array) -> jax.Array:
    """Single-trajectory variant (helpersMSD.py:7-26)."""
    return mean_square_displacements(trajectory[None])[0]


@jax.jit
def estimate_d_from_msds(msds: jax.Array, time_range: jax.Array) -> jax.Array:
    """Origin-constrained least-squares slope / 4 (helpersMSD.py:110-129):
    ``slope = Σ t·msd / Σ t²`` per particle."""
    t = jnp.asarray(time_range, jnp.float32)
    slope = msds @ t / jnp.sum(t * t)
    return slope / 4.0


def estimate_d_from_msd(msd: jax.Array, time_range: jax.Array) -> jax.Array:
    return estimate_d_from_msds(msd[None], time_range)[0]


@jax.jit
def estimate_d_from_msds_weighted(msds: jax.Array, time_range: jax.Array) -> jax.Array:
    """Tau-weighted estimator (helpersMSD.py:131-157): normalize each MSD
    value by its lag index, weight small lags higher (weights T..1), average,
    divide by 4. ``time_range`` is accepted for signature parity but unused,
    exactly like the reference."""
    t = msds.shape[1]
    weights = jnp.arange(t, 0, -1, dtype=jnp.float32)
    div = jnp.arange(t, dtype=jnp.float32).at[0].set(1.0)
    normalized = msds / div[None, :]
    return normalized @ weights / jnp.sum(weights) / 4.0


@jax.jit
def estimate_d_from_msds_polyfit(msds: jax.Array, time_range: jax.Array) -> jax.Array:
    """Degree-1 polyfit (with intercept) slope / 4 (helpersMSD.py:160-180)."""
    t = jnp.asarray(time_range, jnp.float32)
    tm = jnp.mean(t)
    ym = jnp.mean(msds, axis=1)
    slope = ((msds - ym[:, None]) @ (t - tm)) / jnp.sum((t - tm) ** 2)
    return slope / 4.0


@jax.jit
def d_from_msd_tau1(trajectories: jax.Array) -> jax.Array:
    """MSD at lag τ=1 per particle — the classical baseline the poster
    multiplies by 250 (raw sub-positions) or 37.5 (frame-averaged)
    (Experiments/ImagesFeatures/trainSettingsImagesFeatures.py:233-252,
    19-22)."""
    deltas = trajectories[:, 1:] - trajectories[:, :-1]
    return jnp.mean(jnp.sum(deltas**2, axis=2), axis=1)

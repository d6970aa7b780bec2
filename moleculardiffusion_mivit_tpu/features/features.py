"""The 25-dimensional hand-crafted trajectory feature vector.

Vmapped XLA re-implementation of ``compute_diffusion_features``
(helpers/helpersFeatures.py:448-520) with identical feature order
(``feature_names``, :7-33) and semantics:

- MSD over lags 1..N-1 with N = T/2 when T > 20 else T (:102-132);
- bounded power-law fit 2·d·D·t^α + offset (trf → projected LM, :135-191);
- efficiency (+log), Katz-George fractal dimension, gaussianity (four-norm
  based), kurtosis along the dominant covariance eigenvector, MSD ratio,
  trappedness ``1 − exp(0.2045 − 0.25117·(D·T)/r0²)`` (:350-378), convex
  hull area, consecutive-step dot-product statistics, step-length statistics.

The reference's docstring says 24 features but ``N_features`` is 25
(:34, :539) — we follow the code. The batch wrapper replaces NaNs with 0
(:564) like the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.ops.curve_fit import fit_power_law_msd
from moleculardiffusion_mivit_tpu.ops.hull import convex_hull_area

FEATURE_NAMES = [
    "alpha",
    "diffusion_coefficient",
    "r_squared",
    "efficiency_log",
    "efficiency",
    "fractal_dimension",
    "gaussianity",
    "kurtosis",
    "msd_ratio",
    "trappedness",
    "trajectory_length",
    "mean_step_length",
    "mean_msd",
    "mean_dot_product",
    "fraction_same_direction",
    "fraction_positive_direction",
    "total_distance",
    "min_step",
    "max_step",
    "step_range",
    "avg_velocity",
    "step_cv",
    "fraction_small_steps",
    "fraction_large_steps",
    "convex_hull_area",
]
N_FEATURES = len(FEATURE_NAMES)


def _lagged_moments(traj: jax.Array, n_lags: int):
    """For lags 1..n_lags: (msd, four-norm mean) with static shapes.

    msd(lag) = mean_j |x(j+lag) − x(j)|² ; r4(lag) = mean_j (dx⁴ + dy⁴).
    """
    t = traj.shape[0]
    idx = jnp.arange(t)

    def one(lag):
        rolled = jnp.roll(traj, -lag, axis=0)
        d = rolled - traj
        valid = (idx < (t - lag)).astype(jnp.float32)
        denom = jnp.maximum(t - lag, 1)
        msd = jnp.sum(jnp.sum(d * d, axis=1) * valid) / denom
        r4 = jnp.sum(jnp.sum(d**4, axis=1) * valid) / denom
        return msd, r4

    lags = jnp.arange(1, n_lags + 1)
    return jax.vmap(one)(lags)


def _kurtosis_dominant(traj: jax.Array) -> jax.Array:
    """Kurtosis (Fisher=False, population moments) of the projection onto the
    dominant covariance eigenvector (helpersFeatures.py:287-324)."""
    x = traj - jnp.mean(traj, axis=0)
    t = traj.shape[0]
    cov = (x.T @ x) / (t - 1)  # np.cov default ddof=1
    # closed-form dominant eigenvector of symmetric 2x2
    a, b, c = cov[0, 0], cov[0, 1], cov[1, 1]
    tr_half = (a + c) / 2.0
    disc = jnp.sqrt(jnp.maximum(((a - c) / 2.0) ** 2 + b * b, 0.0))
    lam_max = tr_half + disc
    # eigenvector for lam_max: (b, lam_max - a) or (lam_max - c, b)
    v1 = jnp.stack([b, lam_max - a])
    v2 = jnp.stack([lam_max - c, b])
    v = jnp.where(jnp.linalg.norm(v1) > jnp.linalg.norm(v2), v1, v2)
    norm = jnp.linalg.norm(v)
    v = jnp.where(norm > 1e-12, v / jnp.maximum(norm, 1e-12), jnp.array([1.0, 0.0]))
    proj = traj @ v
    m = jnp.mean(proj)
    m2 = jnp.mean((proj - m) ** 2)
    m4 = jnp.mean((proj - m) ** 4)
    return jnp.where(m2 > 0, m4 / jnp.maximum(m2, 1e-30) ** 2, jnp.nan)


@functools.partial(jax.jit, static_argnames=("dt",))
def compute_diffusion_features(trajectory: jax.Array, dt: float = 1.0) -> jax.Array:
    """25 features for one trajectory ``(T, 2)``, T ≥ 3 (static)."""
    traj = jnp.asarray(trajectory, jnp.float32)
    t = traj.shape[0]
    if t < 3:
        raise ValueError("trajectory must have at least 3 points")

    n_msd = int(t * 0.5) if t > 20 else t  # helpersFeatures.py:121
    n_lags = n_msd - 1
    msd_vals, r4_vals = _lagged_moments(traj, n_lags)

    # max pairwise squared distance
    d2 = jnp.sum((traj[:, None, :] - traj[None, :, :]) ** 2, axis=-1)
    max_dist = jnp.max(d2)

    steps = traj[1:] - traj[:-1]
    sl = jnp.sqrt(jnp.sum(steps**2, axis=1))  # (T-1,)
    dots = jnp.sum(steps[:-1] * steps[1:], axis=1)  # (T-2,)

    d_fit, alpha, _offset, r_squared = fit_power_law_msd(msd_vals, dt, dim=2)

    # efficiency (log ratio of squared end-to-end to summed squared steps)
    top = jnp.sum((traj[-1] - traj[0]) ** 2)
    bottom = jnp.sum(jnp.sum(steps**2, axis=1))
    eff = jnp.where(bottom > 0, top / ((t - 1) * jnp.maximum(bottom, 1e-30)), 0.0)
    eff_log = jnp.where(bottom > 0, jnp.log(jnp.maximum(eff, 1e-30)), -jnp.inf)

    # Katz-George fractal dimension
    total_len = jnp.sum(sl)
    fractal = jnp.where(
        total_len > 0,
        jnp.log(jnp.float32(t))
        / (
            jnp.log(jnp.float32(t))
            + jnp.log(jnp.maximum(jnp.sqrt(max_dist) / jnp.maximum(total_len, 1e-30), 1e-30))
        ),
        1.0,
    )

    # gaussianity: mean over lags of r4 / (2·msd²) where msd > 0
    valid = msd_vals > 0
    gauss_terms = r4_vals / (2.0 * jnp.maximum(msd_vals, 1e-30) ** 2)
    n_valid = jnp.sum(valid)
    gaussianity = jnp.where(
        n_valid > 0, jnp.sum(jnp.where(valid, gauss_terms, 0.0)) / jnp.maximum(n_valid, 1), jnp.nan
    )

    kurt = _kurtosis_dominant(traj)

    # msd ratio
    ratios = msd_vals[:-1] / jnp.maximum(msd_vals[1:], 1e-30) - (
        jnp.arange(1, n_lags, dtype=jnp.float32) / jnp.arange(2, n_lags + 1, dtype=jnp.float32)
    )
    msd_ratio = jnp.where(n_lags >= 2, jnp.mean(ratios), jnp.nan)

    # trappedness
    r0 = jnp.sqrt(max_dist) / 2.0
    trapped = jnp.where(
        (r0 > 0) & (d_fit != 0),
        1.0 - jnp.exp(0.2045 - 0.25117 * (d_fit * t) / jnp.maximum(r0, 1e-30) ** 2),
        0.0,
    )

    hull = convex_hull_area(traj)

    mean_sl = jnp.mean(sl)
    n_dots = dots.shape[0]
    mean_dots = jnp.mean(dots) if n_dots > 0 else jnp.nan
    same_dir = (
        jnp.mean((jnp.sign(dots[1:]) == jnp.sign(dots[:-1])).astype(jnp.float32))
        if n_dots > 1
        else jnp.nan
    )
    pos_dir = jnp.mean((jnp.sign(dots) > 0).astype(jnp.float32)) if n_dots > 0 else jnp.nan
    sl_std = jnp.std(sl, ddof=1)
    step_cv = jnp.where((mean_sl > 0) & (sl.shape[0] > 1), sl_std / jnp.maximum(mean_sl, 1e-30), jnp.nan)

    return jnp.stack(
        [
            alpha,
            d_fit,
            r_squared,
            eff_log,
            eff,
            fractal,
            gaussianity,
            kurt,
            msd_ratio,
            trapped,
            jnp.float32(t),
            mean_sl,
            jnp.mean(msd_vals),
            mean_dots,
            same_dir,
            pos_dir,
            jnp.sum(sl),
            jnp.min(sl),
            jnp.max(sl),
            jnp.max(sl) - jnp.min(sl),
            jnp.sum(sl) / t,
            step_cv,
            jnp.mean((sl < 0.1).astype(jnp.float32)),
            jnp.mean((sl > 0.4).astype(jnp.float32)),
            hull,
        ]
    )


@functools.partial(jax.jit, static_argnames=("dt", "n_pos_per_frame"))
def compute_features_for_multiple_trajectories(
    trajectories: jax.Array, dt: float = 1.0, n_pos_per_frame: int = 1
) -> jax.Array:
    """Batch wrapper (helpersFeatures.py:524-568): optional sub-position
    averaging, vmapped single-trajectory features, NaN→0."""
    trajs = jnp.asarray(trajectories, jnp.float32)
    if n_pos_per_frame != 1:
        n, t, d = trajs.shape
        frames = t // n_pos_per_frame
        trajs = trajs[:, : frames * n_pos_per_frame].reshape(
            n, frames, n_pos_per_frame, d
        ).mean(axis=2)
    feats = jax.vmap(lambda tr: compute_diffusion_features(tr, dt))(trajs)
    return jnp.nan_to_num(feats, nan=0.0, posinf=0.0, neginf=0.0)

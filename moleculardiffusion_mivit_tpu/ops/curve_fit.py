"""Bounded nonlinear least squares as a fixed-iteration, vmappable kernel.

Replaces ``scipy.optimize.curve_fit(method='trf', bounds=...)`` used by the
reference for (a) the MSD power-law fit (helpers/helpersFeatures.py:157-191)
and (b) sub-pixel 2-D Gaussian localization (helpers/helpersTracking.py:
555-605). A projected Levenberg–Marquardt with fixed iteration count keeps
shapes static (XLA-friendly), converges to the same interior optima as trf on
these smooth low-dimensional problems, and clamps parameters to box bounds
after every step.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def levenberg_marquardt(
    residual_fn: Callable[[jax.Array], jax.Array],
    p0: jax.Array,
    lower: jax.Array,
    upper: jax.Array,
    num_iters: int = 50,
    lam0: float = 1e-3,
) -> Tuple[jax.Array, jax.Array]:
    """Minimize ``sum(residual_fn(p)**2)`` subject to ``lower <= p <= upper``.

    Returns ``(p, final_cost)``. Uses multiplicative damping (×10 on a
    rejected step, ÷10 on an accepted one) and projects candidate steps onto
    the box. All shapes static; safe under ``vmap``/``jit``.
    """
    p0 = jnp.clip(p0, lower, upper)
    jac_fn = jax.jacfwd(residual_fn)

    def cost(p):
        r = residual_fn(p)
        return jnp.sum(r * r)

    def body(carry, _):
        p, lam, c = carry
        r = residual_fn(p)
        j = jac_fn(p)  # (m, n)
        jtj = j.T @ j
        jtr = j.T @ r
        n = p.shape[0]
        a = jtj + lam * jnp.diag(jnp.maximum(jnp.diag(jtj), 1e-12))
        step = jnp.linalg.solve(a + 1e-12 * jnp.eye(n), -jtr)
        p_new = jnp.clip(p + step, lower, upper)
        c_new = cost(p_new)
        accept = jnp.isfinite(c_new) & (c_new < c)
        p = jnp.where(accept, p_new, p)
        c = jnp.where(accept, c_new, c)
        lam = jnp.where(accept, jnp.maximum(lam * 0.1, 1e-12), jnp.minimum(lam * 10.0, 1e12))
        return (p, lam, c), None

    c0 = cost(p0)
    (p, _, c), _ = jax.lax.scan(body, (p0, jnp.float32(lam0), c0), None, length=num_iters)
    return p, c


def _profiled_power_law_cost(alpha, t, y, dim):
    """For fixed α the model ``2·dim·D·t^α + c`` is linear in (D, c):
    solve the box-constrained 2-var least squares (D ≥ 1e-5, c ≥ 0) in
    closed form by comparing the unconstrained solution with each
    active-constraint candidate. Returns ``(cost, D, c)``."""
    f = 2.0 * dim * t**alpha  # (m,)
    m = t.shape[0]
    sff = jnp.sum(f * f)
    sf = jnp.sum(f)
    sfy = jnp.sum(f * y)
    sy = jnp.sum(y)
    det = sff * m - sf * sf

    def cost_of(d, c):
        r = f * d + c - y
        return jnp.sum(r * r)

    d_min = jnp.float32(1e-5)
    # unconstrained
    d_u = (sfy * m - sf * sy) / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    c_u = (sy - sf * d_u) / m
    # D clamped at bound, c free (c >= 0)
    c_d = jnp.maximum((sy - sf * d_min) / m, 0.0)
    # c clamped at 0, D free (D >= d_min)
    d_c = jnp.maximum(sfy / jnp.maximum(sff, 1e-30), d_min)

    cands_d = jnp.stack([d_u, d_min, d_c, d_min])
    cands_c = jnp.stack([c_u, c_d, jnp.float32(0.0), jnp.float32(0.0)])
    feasible = jnp.stack(
        [
            (d_u >= d_min) & (c_u >= 0.0),
            jnp.array(True),
            jnp.array(True),
            jnp.array(True),
        ]
    )
    costs = jax.vmap(cost_of)(cands_d, cands_c)
    costs = jnp.where(feasible, costs, jnp.inf)
    best = jnp.argmin(costs)
    return costs[best], cands_d[best], cands_c[best]


def fit_power_law_msd(
    msds: jax.Array,
    dt: float = 1.0,
    dim: int = 2,
    grid_points: int = 96,
    refine_iters: int = 40,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """MSD power-law fit ``2·dim·D·t^α + offset`` with the reference's
    bounds (helpersFeatures.py:165-166: D, α ≥ 1e-5, α ≤ 10, offset ≥ 0).

    Since D and offset are linear given α, they are profiled out in closed
    form (box-constrained 2-var least squares) and α is found by a dense grid
    over [1e-5, 10] followed by golden-section refinement — globally robust
    where iterative trf/LM can stall in the degenerate D–α valley, and fully
    vmappable. Returns ``(D, alpha, offset, r_squared)``; r² doubles as the
    reference's goodness-of-fit "pval" (:181-185). Non-finite inputs degrade
    to zeros like the reference's fit-failure path (:187-189).
    """
    y = jnp.asarray(msds, jnp.float32)
    m = y.shape[0]
    t = (jnp.arange(1, m + 1, dtype=jnp.float32)) * dt

    lo, hi = jnp.float32(1e-5), jnp.float32(10.0)
    alphas = jnp.linspace(lo, hi, grid_points)
    costs, _, _ = jax.vmap(lambda a: _profiled_power_law_cost(a, t, y, dim))(alphas)
    best = jnp.argmin(costs)
    step = (hi - lo) / (grid_points - 1)
    a_lo = jnp.maximum(alphas[best] - step, lo)
    a_hi = jnp.minimum(alphas[best] + step, hi)

    # golden-section on the profiled cost
    gr = jnp.float32(0.6180339887)

    def golden_body(carry, _):
        a, b = carry
        c = b - gr * (b - a)
        d = a + gr * (b - a)
        fc, _, _ = _profiled_power_law_cost(c, t, y, dim)
        fd, _, _ = _profiled_power_law_cost(d, t, y, dim)
        a_new = jnp.where(fc < fd, a, c)
        b_new = jnp.where(fc < fd, d, b)
        return (a_new, b_new), None

    (a_lo, a_hi), _ = jax.lax.scan(golden_body, (a_lo, a_hi), None, length=refine_iters)
    alpha = (a_lo + a_hi) / 2.0
    ss_res, d_fit, offset = _profiled_power_law_cost(alpha, t, y, dim)

    ss_tot = jnp.sum((y - jnp.mean(y)) ** 2)
    r_squared = 1.0 - ss_res / jnp.where(ss_tot > 0, ss_tot, 1.0)
    ok = (
        jnp.isfinite(d_fit)
        & jnp.isfinite(alpha)
        & jnp.isfinite(offset)
        & jnp.isfinite(r_squared)
    )
    zero = jnp.float32(0.0)
    return (
        jnp.where(ok, d_fit, zero),
        jnp.where(ok, alpha, zero),
        jnp.where(ok, offset, zero),
        jnp.where(ok, r_squared, zero),
    )


def fit_gaussian_2d(
    patch: jax.Array, num_iters: int = 40
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric 2-D Gaussian fit for sub-pixel localization
    (helpersTracking.py:559-586): model
    ``offset + A·exp(-((x-x0)² + (y-y0)²)/(2σ²))`` with initial guess
    (max, center, center, 1.0, min). Returns ``(params (A,x0,y0,sigma,offset),
    converged_cost)``."""
    patch = jnp.asarray(patch, jnp.float32)
    h, w = patch.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.astype(jnp.float32).ravel()
    ys = ys.astype(jnp.float32).ravel()
    target = patch.ravel()
    half_x = (w - 1) // 2
    half_y = (h - 1) // 2

    def residual(p):
        amp, x0, y0, sigma, offset = p
        g = offset + amp * jnp.exp(
            -(((xs - x0) ** 2 + (ys - y0) ** 2) / (2.0 * sigma**2))
        )
        return g - target

    p0 = jnp.array(
        [jnp.max(patch), float(half_x), float(half_y), 1.0, jnp.min(patch)], jnp.float32
    )
    lower = jnp.array([-jnp.inf, -jnp.inf, -jnp.inf, 1e-3, -jnp.inf], jnp.float32)
    upper = jnp.full((5,), jnp.inf, jnp.float32)
    return levenberg_marquardt(residual, p0, lower, upper, num_iters)

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculardiffusion_mivit_tpu.features import (
    FEATURE_NAMES,
    N_FEATURES,
    compute_diffusion_features,
    compute_features_for_multiple_trajectories,
    d_from_msd_tau1,
    estimate_d_from_msds,
    estimate_d_from_msds_polyfit,
    estimate_d_from_msds_weighted,
    mean_square_displacements,
)
from moleculardiffusion_mivit_tpu.ops.curve_fit import fit_power_law_msd
from moleculardiffusion_mivit_tpu.ops.hull import convex_hull_area


def brownian(rng, n, t, d):
    steps = rng.normal(0, np.sqrt(2 * d), size=(n, t, 2))
    return np.cumsum(steps, axis=1)


def test_msd_matches_direct_computation(rng):
    trajs = brownian(rng, 4, 40, 1.0)
    ours = np.asarray(mean_square_displacements(jnp.asarray(trajs)))
    for tau in range(1, 40):
        expected = ((trajs[:, tau:] - trajs[:, : 40 - tau]) ** 2).sum(-1).mean(1)
        np.testing.assert_allclose(ours[:, tau], expected, rtol=1e-4)
    np.testing.assert_allclose(ours[:, 0], 0.0)


def test_d_estimators_recover_diffusion_coefficient(rng):
    d_true = 3.0
    trajs = brownian(rng, 200, 100, d_true)
    msds = mean_square_displacements(jnp.asarray(trajs))
    tr = jnp.arange(100, dtype=jnp.float32)
    # Exact-formula checks against numpy oracles (the estimators themselves),
    # then a loose statistical recovery band (long-lag MSDs are high-variance
    # with 200 particles, so recovery tightness is seed-dependent).
    m = np.asarray(msds)
    t = np.asarray(tr)
    ours_ls = np.asarray(estimate_d_from_msds(msds, tr))
    np.testing.assert_allclose(ours_ls, (m @ t) / (t @ t) / 4.0, rtol=1e-4)
    ours_pf = np.asarray(estimate_d_from_msds_polyfit(msds, tr))
    np.testing.assert_allclose(ours_pf, np.polyfit(t, m.T, deg=1)[0] / 4.0, rtol=1e-4)
    for est in (estimate_d_from_msds, estimate_d_from_msds_weighted, estimate_d_from_msds_polyfit):
        d_est = float(np.mean(np.asarray(est(msds, tr))))
        assert abs(d_est - d_true) / d_true < 0.25, est.__name__
    d_tau1 = float(np.mean(np.asarray(d_from_msd_tau1(jnp.asarray(trajs))))) / 4.0
    assert abs(d_tau1 - d_true) / d_true < 0.1


def test_hull_area_matches_scipy(rng):
    ConvexHull = pytest.importorskip("scipy.spatial").ConvexHull
    for _ in range(5):
        pts = rng.normal(size=(30, 2))
        ours = float(convex_hull_area(jnp.asarray(pts)))
        ref = ConvexHull(pts).volume
        np.testing.assert_allclose(ours, ref, rtol=1e-4)
    # degenerate: all identical
    assert float(convex_hull_area(jnp.zeros((10, 2)))) == 0.0
    # collinear
    line = np.stack([np.arange(8.0), 2 * np.arange(8.0)], axis=1)
    assert abs(float(convex_hull_area(jnp.asarray(line)))) < 1e-4


def test_power_law_fit_matches_scipy(rng):
    curve_fit = pytest.importorskip("scipy.optimize").curve_fit
    trajs = brownian(rng, 6, 30, 2.0)
    msds = np.asarray(mean_square_displacements(jnp.asarray(trajs)))[:, 1:15]

    def power_law(t, D, alpha, offset):
        return 2 * 2 * D * t**alpha + offset

    for m in msds:
        t_vals = np.arange(1, len(m) + 1, dtype=float)
        p0 = [m[0] / 4.0, 1, 0.001]
        bounds = ([1e-5, 1e-5, 0], [np.inf, 10, np.inf])
        ref, _ = curve_fit(power_law, t_vals, m, p0=p0, bounds=bounds, method="trf", maxfev=10000)
        d, alpha, offset, r2 = fit_power_law_msd(jnp.asarray(m, jnp.float32))
        # The cost must match scipy's optimum (the D-alpha valley is nearly
        # degenerate, so parameters may differ more than the cost does).
        ref_cost = np.sum((power_law(t_vals, *ref) - m) ** 2)
        our_cost = np.sum((power_law(t_vals, float(d), float(alpha), float(offset)) - m) ** 2)
        assert our_cost <= ref_cost * 1.02 + 1e-6
        np.testing.assert_allclose(float(d), ref[0], rtol=0.15, atol=0.05)
        np.testing.assert_allclose(float(alpha), ref[1], rtol=0.15, atol=0.05)
        assert 0.5 < float(r2) <= 1.0


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"), reason="no reference")
def test_features_match_reference_implementation(rng):
    """Run the actual reference feature extractor (read-only import) on the
    same trajectories and compare all 25 features."""
    sys.path.insert(0, "/root/reference")
    try:
        from helpers import helpersFeatures as hf
    finally:
        sys.path.remove("/root/reference")

    assert FEATURE_NAMES == hf.feature_names
    assert N_FEATURES == hf.N_features == 25

    trajs = brownian(rng, 5, 30, 2.0)
    fit_based = {0, 1, 2, 9}  # alpha, D, r_squared, trappedness (trf vs LM)
    for traj in trajs:
        ref = hf.compute_diffusion_features(traj, dt=1.0)
        ours = np.asarray(compute_diffusion_features(jnp.asarray(traj, jnp.float32), dt=1.0))
        for i, name in enumerate(FEATURE_NAMES):
            if i in fit_based:
                np.testing.assert_allclose(
                    ours[i], ref[i], rtol=0.15, atol=0.1, err_msg=name
                )
            else:
                np.testing.assert_allclose(
                    ours[i], ref[i], rtol=2e-3, atol=1e-4, err_msg=name
                )


def test_batch_wrapper_shapes_and_nan_handling(rng):
    trajs = brownian(rng, 8, 60, 1.0)
    feats = compute_features_for_multiple_trajectories(jnp.asarray(trajs), dt=1.0)
    assert feats.shape == (8, 25)
    assert np.isfinite(np.asarray(feats)).all()
    # with sub-position averaging
    feats2 = compute_features_for_multiple_trajectories(
        jnp.asarray(trajs), dt=1.0, n_pos_per_frame=10
    )
    assert feats2.shape == (8, 25)
    assert float(feats2[0, 10]) == 6.0  # trajectory_length after averaging

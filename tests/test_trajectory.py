import jax
import jax.numpy as jnp
import numpy as np

from moleculardiffusion_mivit_tpu.sim import (
    average_trajectories_frames,
    brownian_motion,
    fbm_trajectories,
    fractional_gaussian_noise,
    single_state,
)


def test_brownian_shapes_and_step_scale():
    key = jax.random.key(0)
    D, dt, npos = 2.0, 1.0, 10
    traj = brownian_motion(key, 200, 30, npos, D, dt)
    assert traj.shape == (200, 300, 2)
    steps = np.diff(np.asarray(traj), axis=1)
    expected_sigma = np.sqrt(2 * D * dt / npos)
    assert abs(steps.std() - expected_sigma) / expected_sigma < 0.02


def test_brownian_per_particle_D():
    key = jax.random.key(1)
    Ds = jnp.array([1.0, 9.0])
    traj = brownian_motion(key, 2, 50, 10, Ds, 1.0)
    steps = np.diff(np.asarray(traj), axis=1)
    s0, s1 = steps[0].std(), steps[1].std()
    assert abs(s1 / s0 - 3.0) < 0.25  # sigma ratio = sqrt(9/1)


def test_average_trajectories_frames():
    trajs = jnp.arange(2 * 12 * 2, dtype=jnp.float32).reshape(2, 12, 2)
    avg = average_trajectories_frames(trajs, 4)
    assert avg.shape == (2, 3, 2)
    expected = np.asarray(trajs).reshape(2, 3, 4, 2).mean(axis=2)
    np.testing.assert_allclose(np.asarray(avg), expected, rtol=1e-6)


def test_single_state_labels_and_truncation():
    key = jax.random.key(2)
    trajs, labels = single_state(key, 4000, 50, Ds=(1.0, 1.0), alphas=1)
    assert trajs.shape == (4000, 50, 2)
    assert labels.shape == (4000, 50, 3)
    d = np.asarray(labels[:, 0, 1])
    assert d.min() >= 0.0  # truncated at zero like the andi redraw loop
    # Truncated-normal mean for mean=sigma=1: 1 + phi(-1)/(1-Phi(-1)) ≈ 1.288
    assert abs(d.mean() - 1.288) < 0.05
    np.testing.assert_allclose(np.asarray(labels[:, :, 0]), 1.0)  # alpha
    # labels constant along time
    np.testing.assert_allclose(np.asarray(labels[:, 0, 1]), np.asarray(labels[:, -1, 1]))


def test_single_state_loop_closure_msd():
    """AnDi-Tests.ipynb-style check: D re-estimated from MSD(tau=1) of the
    generated trajectory matches the label."""
    key = jax.random.key(3)
    trajs, labels = single_state(key, 500, 300, Ds=(5.0, 0.0), alphas=1)
    steps = np.diff(np.asarray(trajs), axis=1)
    msd1 = (steps**2).sum(-1).mean()
    d_est = msd1 / 4.0  # MSD(tau) = 4 D tau, dt=1
    assert abs(d_est - 5.0) / 5.0 < 0.03


def test_fgn_white_noise_case():
    key = jax.random.key(4)
    x = np.asarray(fractional_gaussian_noise(key, 0.5, 2048, batch=64))
    assert x.shape == (64, 2048)
    assert abs(x.var() - 1.0) < 0.05
    lag1 = np.mean(x[:, :-1] * x[:, 1:])
    assert abs(lag1) < 0.05  # H=0.5 → uncorrelated


def test_fgn_correlated_case():
    key = jax.random.key(5)
    h = 0.75
    x = np.asarray(fractional_gaussian_noise(key, h, 4096, batch=64))
    assert abs(x.var() - 1.0) < 0.05
    lag1 = np.mean(x[:, :-1] * x[:, 1:]) / x.var()
    expected = 2 ** (2 * h - 1) - 1  # gamma(1) for unit-variance fGn
    assert abs(lag1 - expected) < 0.05


def test_fbm_subdiffusive_msd_exponent():
    key = jax.random.key(6)
    alpha = 0.6
    trajs = np.asarray(fbm_trajectories(key, 256, 512, alpha, 1.0))
    # MSD(tau) ∝ tau^alpha: fit exponent over lags 1..32
    lags = np.array([1, 2, 4, 8, 16, 32])
    msd = [((trajs[:, lag:] - trajs[:, :-lag]) ** 2).sum(-1).mean() for lag in lags]
    slope = np.polyfit(np.log(lags), np.log(msd), 1)[0]
    assert abs(slope - alpha) < 0.08


def test_drift_loop_closure():
    """Drifting trajectories (AnDi-Directional_Tests.ipynb analog): the mean
    step recovers the drift velocity, and MSD of drift-subtracted steps
    recovers D."""
    from moleculardiffusion_mivit_tpu.sim import brownian_motion, single_state

    trajs, labels = single_state(jax.random.key(10), 200, 300, Ds=(2.0, 0.0), drift=(0.5, -0.3))
    disp = np.diff(np.asarray(trajs), axis=1)
    v = disp.mean(axis=(0, 1))
    np.testing.assert_allclose(v, [0.5, -0.3], atol=0.03)
    d_est = ((disp - v) ** 2).sum(-1).mean() / 4.0
    assert abs(d_est - 2.0) < 0.1
    # labels unaffected by drift
    np.testing.assert_allclose(np.asarray(labels[:, :, 1]), 2.0)

    # brownian_motion drift is per unit time: dt=2, nposframe=4 → per-step v*dt/npos
    bm = np.asarray(brownian_motion(jax.random.key(11), 128, 10, 4, 1.0, dt=2.0, drift=(1.0, 0.0)))
    step_mean = np.diff(bm, axis=1).mean(axis=(0, 1))
    np.testing.assert_allclose(step_mean, [1.0 * 2.0 / 4.0, 0.0], atol=0.05)


def test_confined_single_state_reflecting_box():
    """L > 0 (the andi confinement arg the reference always passes as 0):
    particles stay inside [0, L]^2, the long-time positional distribution is
    ~uniform (per-axis variance L^2/12), and MSD saturates far below the free
    4*D*t growth."""
    from moleculardiffusion_mivit_tpu.sim import single_state

    L = 3.0
    trajs, labels = single_state(jax.random.key(3), 256, 400, Ds=(1.0, 0.0), L=L)
    trajs = np.asarray(trajs)
    assert trajs.min() >= 0.0 and trajs.max() <= L
    # stationary uniform: var per axis = L^2/12
    late = trajs[:, 200:, :]
    np.testing.assert_allclose(late.var(), L**2 / 12.0, rtol=0.1)
    # MSD plateaus at ~2 axes * 2 * L^2/12 = L^2/3, far below free 4*D*t
    lag = 100
    msd = ((trajs[:, lag:] - trajs[:, :-lag]) ** 2).sum(-1).mean()
    assert msd < 0.25 * (4.0 * 1.0 * lag)
    np.testing.assert_allclose(msd, L**2 / 3.0, rtol=0.15)
    # labels unchanged by confinement
    np.testing.assert_allclose(np.asarray(labels[:, :, 1]), 1.0)

    # L=0 stays the free-diffusion path (reference's only usage)
    free, _ = single_state(jax.random.key(3), 8, 50, Ds=(1.0, 0.0), L=0.0)
    assert np.asarray(free).min() < 0.0


def test_drift_with_start_at_zero_begins_at_origin():
    """start_at_zero zeroes the FIRST position even when drift is active
    (the drift increment must not be re-added to the zeroed step)."""
    from moleculardiffusion_mivit_tpu.sim import brownian_motion

    bm = np.asarray(
        brownian_motion(
            jax.random.key(5), 8, 4, 5, 1.0, dt=1.0, start_at_zero=True, drift=(2.0, -1.0)
        )
    )
    np.testing.assert_allclose(bm[:, 0, :], 0.0, atol=0.0)
    # subsequent steps still carry the drift: mean step ~ v*dt/nposframe
    step_mean = np.diff(bm, axis=1).mean(axis=(0, 1))
    np.testing.assert_allclose(step_mean, [2.0 / 5, -1.0 / 5], atol=0.15)

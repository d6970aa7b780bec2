import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculardiffusion_mivit_tpu.sim import (
    PiecewiseLinearGeometry,
    disp_fbm,
    reflected_rectangle_trajectories,
)


def test_geometry_position_lookup():
    geo = PiecewiseLinearGeometry([(0, 0), (1, 0), (1, 2)])
    assert geo.total_length == pytest.approx(3.0)
    pos = np.asarray(geo.position_at_distance(jnp.array([0.0, 0.5, 1.0, 2.0, 3.0, 99.0])))
    np.testing.assert_allclose(pos[0], [0, 0], atol=1e-6)
    np.testing.assert_allclose(pos[1], [0.5, 0], atol=1e-6)
    np.testing.assert_allclose(pos[2], [1, 0], atol=1e-6)
    np.testing.assert_allclose(pos[3], [1, 1], atol=1e-6)
    np.testing.assert_allclose(pos[4], [1, 2], atol=1e-6)
    np.testing.assert_allclose(pos[5], [1, 2], atol=1e-6)  # clamped at end


def test_map_displacements_clamps_at_ends():
    geo = PiecewiseLinearGeometry([(0, 0), (10, 0)])
    disp = jnp.array([[5.0, 20.0, -3.0, -50.0, 1.0]])
    pos = np.asarray(geo.map_displacements(disp))
    np.testing.assert_allclose(pos[0, :, 0], [5.0, 10.0, 7.0, 0.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(pos[0, :, 1], 0.0, atol=1e-6)


def test_simulate_on_geometry_stays_on_path():
    geo = PiecewiseLinearGeometry([(0, 0), (3, 0), (3, 3), (6, 3)])
    trajs = np.asarray(geo.simulate(jax.random.key(0), 16, 200, D=0.5))
    assert trajs.shape == (16, 200, 2)
    # every position lies on one of the segments (distance to path ~ 0)
    on_h1 = (np.abs(trajs[..., 1]) < 1e-4) & (trajs[..., 0] <= 3 + 1e-4)
    on_v = (np.abs(trajs[..., 0] - 3) < 1e-4)
    on_h2 = (np.abs(trajs[..., 1] - 3) < 1e-4) & (trajs[..., 0] >= 3 - 1e-4)
    assert np.all(on_h1 | on_v | on_h2)


def test_disp_fbm_scaling():
    d = np.asarray(disp_fbm(jax.random.key(1), alpha=1.0, D=2.0, T=4096, batch=16))
    assert abs(d.var() - 4.0) / 4.0 < 0.1  # 2*D*dt = 4


def test_reflected_rectangle_confinement():
    trajs = np.asarray(
        reflected_rectangle_trajectories(
            jax.random.key(2), 8, 500, rect_center=(5.0, -2.0), rect_size=(2.0, 1.0),
            angle=0.0, D=1.0,
        )
    )
    assert trajs.shape == (8, 500, 2)
    assert trajs[..., 0].min() >= 4.0 - 1e-4 and trajs[..., 0].max() <= 6.0 + 1e-4
    assert trajs[..., 1].min() >= -2.5 - 1e-4 and trajs[..., 1].max() <= -1.5 + 1e-4
    # confinement actually reached (particles explore the box)
    assert trajs[..., 0].max() - trajs[..., 0].min() > 1.5


def test_reflected_rectangle_rotation():
    trajs = np.asarray(
        reflected_rectangle_trajectories(
            jax.random.key(3), 4, 300, rect_center=(0.0, 0.0), rect_size=(4.0, 1.0),
            angle=np.pi / 2, D=1.0,
        )
    )
    # rotated 90°: long axis now along y
    assert np.ptp(trajs[..., 1]) > np.ptp(trajs[..., 0])
    assert trajs[..., 0].max() <= 0.5 + 1e-4

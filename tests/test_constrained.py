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


def test_edge_queries():
    from moleculardiffusion_mivit_tpu.sim import Edge

    e = Edge((0, 0), (3, 4))
    assert e.length == pytest.approx(5.0)
    assert e.angle == pytest.approx(np.arctan2(4, 3))
    np.testing.assert_allclose(e.get_position_at_distance(2.5), [1.5, 2.0], atol=1e-6)
    np.testing.assert_allclose(e.get_position_at_distance(99.0), [3, 4], atol=1e-6)
    assert e.distance_to_end((1.5, 2.0)) == pytest.approx(2.5)


def test_geometry_from_edge_list_three_edge_skeleton():
    """Edge-list construction with the reference's connectivity validation
    (mitochnodria.py:151-176) on a branchless 3-edge skeleton."""
    from moleculardiffusion_mivit_tpu.sim import Edge

    geo = PiecewiseLinearGeometry.from_edges(
        [Edge((0, 0), (2, 0)), ((2, 0), (2, 1)), Edge((2, 1), (4, 1))]
    )
    assert geo.n_edges == 3
    assert geo.total_length == pytest.approx(5.0)
    assert geo.bounding_box == (0.0, 4.0, 0.0, 1.0)
    edge, rem = geo.get_edge_at_length(2.5)
    np.testing.assert_allclose(edge.start_point, [2, 0])
    assert rem == pytest.approx(0.5)
    assert geo.get_edge_at_length(-1.0) == (None, 0.0)
    assert geo.get_edge_at_length(5.5) == (None, 0.0)
    # same path as the vertex constructor
    vgeo = PiecewiseLinearGeometry([(0, 0), (2, 0), (2, 1), (4, 1)])
    d = jnp.linspace(0.0, 5.0, 21)
    np.testing.assert_allclose(
        np.asarray(geo.position_at_distance(d)), np.asarray(vgeo.position_at_distance(d))
    )


def test_geometry_from_edges_rejects_disconnected():
    with pytest.raises(ValueError, match="between edges 0 and 1"):
        PiecewiseLinearGeometry.from_edges([((0, 0), (1, 0)), ((2, 0), (3, 0))])
    with pytest.raises(ValueError):
        PiecewiseLinearGeometry.from_edges([])


def test_get_edge_at_position():
    geo = PiecewiseLinearGeometry([(0, 0), (2, 0), (2, 3)])
    # interior of edge 0, interior of edge 1, shared vertex → first edge
    assert geo.get_edge_at_position((1.0, 0.0)) is geo.edges[0]
    assert geo.get_edge_at_position((2.0, 1.5)) is geo.edges[1]
    assert geo.get_edge_at_position((2.0, 0.0)) is geo.edges[0]
    # off-skeleton and beyond-the-end points find nothing
    assert geo.get_edge_at_position((1.0, 1.0)) is None
    assert geo.get_edge_at_position((2.0, 3.5)) is None


def test_constrained_video_d_recovery():
    """End-to-end: constrained fBm on a skeleton → rendered fluorescence
    video → MSD D-estimate recovers the input D (the experiment the
    reference abandoned, README.md:84)."""
    from moleculardiffusion_mivit_tpu.config import BASELINE_OPTICS
    from moleculardiffusion_mivit_tpu.sim import trajectories_to_video

    d_true = 0.5
    geo = PiecewiseLinearGeometry.from_edges(
        [((0, 0), (40, 0)), ((40, 0), (40, 40)), ((40, 40), (80, 40))]
    )
    trajs = geo.simulate(
        jax.random.key(3), 8, 300, D=d_true * 100.0, initial_distance=60.0
    )
    # render like the training pipeline: traj units /100, 10 subpos/frame
    videos = trajectories_to_video(
        jax.random.key(4), trajs / 100.0, 10, True, BASELINE_OPTICS
    )
    assert videos.shape == (8, 30, 9, 9)
    assert np.isfinite(np.asarray(videos)).all()
    # D from MSD tau=1 of the raw (sub-position) constrained trajectories;
    # 1-D confinement halves the 2-D MSD, so estimate on the free early lags
    disp = np.diff(np.asarray(trajs), axis=1)
    d_est = (disp**2).sum(-1).mean() / 4.0 / 100.0
    # along a straight run the walk is 1-D: MSD_2D = 2*D_1D*t with the same
    # step variance → estimator recovers D/2... unless both axes move at a
    # corner. Accept the 1-D projection value.
    assert 0.3 * d_true < d_est < 1.2 * d_true

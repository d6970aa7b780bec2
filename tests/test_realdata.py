import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculardiffusion_mivit_tpu.config import OpticsConfig
from moleculardiffusion_mivit_tpu.realdata import (
    analyze_microscopy_sequence,
    detect_particles,
    estimate_d_for_tracks,
    extract_particle_patches,
    link_particles,
    read_tiff_stack,
    refine_localizations,
    track_particles,
    tracks_to_dataframe,
    write_tiff_stack,
)
from moleculardiffusion_mivit_tpu.sim import render_widefield

FIELD = 63
OPTICS = OpticsConfig(
    particle_intensity=(4000.0, 200.0),
    psf_division_factor=1.3,
    output_size=9,
    background_intensity=(1000.0, 100.0),
    poisson_noise=100.0,
    trajectory_unit=-1,
)


def make_movie(n_particles=4, n_frames=20, d_px=0.25, seed=0):
    """Well-separated diffusing particles in a 63x63 field."""
    rng = np.random.default_rng(seed)
    # starting positions on a coarse grid, away from borders
    starts = np.stack(
        np.meshgrid(np.linspace(14, 49, 2), np.linspace(14, 49, 2)), -1
    ).reshape(-1, 2)[:n_particles]
    steps = rng.normal(0, np.sqrt(2 * d_px), size=(n_particles, n_frames, 2))
    steps[:, 0] = 0
    trajs = starts[:, None, :] + np.cumsum(steps, axis=1)
    movie = np.asarray(
        render_widefield(
            jax.random.key(seed), jnp.asarray(trajs, jnp.float32), 1, FIELD, OPTICS
        )
    )
    return movie, trajs


def test_detect_particles_finds_spots():
    movie, trajs = make_movie()
    coords, dog = detect_particles(movie[0], min_distance=5)
    assert dog.shape == (FIELD, FIELD)
    assert len(coords) == 4
    # each detection within 1.5 px of a true position (coords are (y, x))
    for y, x in coords:
        dists = np.sqrt(((trajs[:, 0] - [x, y]) ** 2).sum(-1))
        assert dists.min() < 1.5


def test_link_particles_matching():
    c0 = np.array([[10.0, 10.0], [30.0, 30.0], [50.0, 10.0]])
    c1 = np.array([[31.0, 31.0], [11.0, 9.0]])  # shuffled, one lost
    links, un0, un1 = link_particles(c0, c1, max_distance=5.0)
    assert sorted(links) == [(0, 1), (1, 0)]
    assert un0 == [2] and un1 == []
    # distance gate
    links2, _, _ = link_particles(c0, c1 + 100.0, max_distance=5.0)
    assert links2 == []


def test_tracking_recovers_trajectories():
    movie, trajs = make_movie(n_frames=20)
    tracks, detections, dog = track_particles(
        movie, min_distance=5, max_linking_distance=8.0, min_track_length=10
    )
    assert len(tracks) == 4
    # match each track to its true particle and check positional error
    for tid, positions in tracks.items():
        arr = np.asarray(positions)  # (L, 3): frame, y, x
        assert len(arr) >= 18  # nearly full-length tracks
        f0, y0, x0 = arr[0]
        dists = np.sqrt(((trajs[:, int(f0)] - [x0, y0]) ** 2).sum(-1))
        pi = dists.argmin()
        true_xy = trajs[pi, arr[:, 0].astype(int)]
        err = np.sqrt(((true_xy - arr[:, [2, 1]]) ** 2).sum(-1))
        assert err.mean() < 1.0  # integer-pixel detection accuracy


def test_localization_refines_below_half_pixel():
    movie, trajs = make_movie(n_frames=12, d_px=0.15, seed=3)
    tracks, _, _ = track_particles(
        movie, min_distance=5, max_linking_distance=8.0, min_track_length=10
    )
    patches = extract_particle_patches(movie, tracks, patch_size=9)
    refined = refine_localizations(tracks, patches, patch_size=9)
    errs_refined, errs_integer = [], []
    for (tid, frame), info in refined.items():
        arr = np.asarray(tracks[tid])
        f0, y0, x0 = arr[0]
        pi = np.sqrt(((trajs[:, int(f0)] - [x0, y0]) ** 2).sum(-1)).argmin()
        true_x, true_y = trajs[pi, frame]
        errs_refined.append(np.hypot(info["x_refined"] - true_x, info["y_refined"] - true_y))
        row = arr[arr[:, 0] == frame][0]
        errs_integer.append(np.hypot(row[2] - true_x, row[1] - true_y))
    assert np.mean(errs_refined) < 0.25
    assert np.mean(errs_refined) < np.mean(errs_integer)


def test_tracks_dataframe_columns():
    pd = pytest.importorskip("pandas")
    movie, _ = make_movie(n_frames=10)
    tracks, _, _ = track_particles(
        movie, min_distance=5, max_linking_distance=8.0, min_track_length=5
    )
    patches = extract_particle_patches(movie, tracks, patch_size=9)
    df = tracks_to_dataframe(tracks, patches, patch_size=9)
    expected = {
        "nbr_frames", "x", "y", "x_refined", "y_refined", "psf_size",
        "max_intensity", "displacement", "mean_displacement", "mean_psf_size",
        "max_intensity_over_track", "mean_max_intensity_over_track",
        "std_max_intensity_over_track",
    }
    assert expected <= set(df.columns)
    assert df.index.names == ["track_id", "frame"]
    # first displacement of each track is 0
    firsts = df.groupby("track_id")["displacement"].first()
    np.testing.assert_allclose(firsts.values, 0.0)


def test_estimate_d_for_tracks_msd_baseline():
    d_true = 0.25  # px²/frame
    movie, trajs = make_movie(n_particles=4, n_frames=20, d_px=d_true, seed=7)
    tracks, _, _ = track_particles(
        movie, min_distance=5, max_linking_distance=8.0, min_track_length=15
    )
    patches = extract_particle_patches(movie, tracks, patch_size=9)
    refined = refine_localizations(tracks, patches, patch_size=9)

    def fake_model(videos):  # inference plumbing check only
        return jnp.full((videos.shape[0], 1), 1.23)

    results = estimate_d_for_tracks(
        tracks,
        movie,
        fake_model,
        patch_size=9,
        background_mean=1000.0,
        background_sigma=100.0,
        theoretical_max=5000.0,
        msd_calibration=0.25,  # MSD(tau=1) = 4 D (pixel domain, dt=1 frame)
        refined_positions=refined,
    )
    assert len(results) == len(tracks)
    d_msd = np.asarray([r["d_msd"] for r in results.values()])
    # localization-noise bias inflates MSD slightly; generous band
    assert 0.4 * d_true < d_msd.mean() < 2.0 * d_true
    assert all(abs(r["d_model"] - 1.23) < 1e-5 for r in results.values())


def test_analyze_sequence_and_tiff_roundtrip(tmp_path):
    movie, _ = make_movie(n_frames=8)
    path = str(tmp_path / "movie.tif")
    write_tiff_stack(path, movie)
    loaded = read_tiff_stack(path)
    np.testing.assert_allclose(loaded, movie, rtol=1e-6)

    tracks, detections, dog = analyze_microscopy_sequence(
        loaded,
        min_distance=5,
        max_linking_distance=8.0,
        min_track_length=5,
        output_prefix=str(tmp_path / "out"),
    )
    assert len(tracks) >= 3
    assert os.path.exists(tmp_path / "out_tracks.pkl")
    assert os.path.exists(tmp_path / "out_detections.csv")


def test_viz_helpers_headless():
    from moleculardiffusion_mivit_tpu.realdata import viz

    movie, trajs = make_movie(n_frames=6)
    coords, dog = detect_particles(movie[0], min_distance=5)
    fig = viz.visualize_dog_detection(movie[0], dog, coords)
    assert fig is not None
    tracks, _, _ = track_particles(
        movie, min_distance=5, max_linking_distance=8.0, min_track_length=3
    )
    assert viz.visualize_tracks(movie, tracks) is not None
    assert viz.plot_particle_trajectory(trajs[0]) is not None
    fig, anim = viz.play_video(movie)
    assert anim is not None


def test_play_video_gif_export_with_tracks(tmp_path):
    from moleculardiffusion_mivit_tpu.realdata import viz

    movie, _ = make_movie(n_frames=4)
    tracks, _, _ = track_particles(
        movie, min_distance=5, max_linking_distance=8.0, min_track_length=3
    )
    path = str(tmp_path / "anim.gif")
    fig, anim = viz.play_video(movie, save_path=path, tracks=tracks)
    import os
    assert os.path.getsize(path) > 1000

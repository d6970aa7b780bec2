import jax
import jax.numpy as jnp
import numpy as np

from moleculardiffusion_mivit_tpu.ops.pallas_render import pallas_render_frames
from moleculardiffusion_mivit_tpu.sim.render import (
    render_frames_core,
    set_render_backend,
)


def test_pallas_renderer_matches_xla_path():
    """Interpreter-mode check on CPU; the same kernel compiles on TPU
    (verified on hardware 2026-08-18 for the final batch-in-lanes variant:
    max rel diff 1.2e-5 vs the XLA path at B=1920, 9×9 and 13×13 — the
    hi/lo bf16 operand splits bound the MXU error at ~|v|·2^-18)."""
    key = jax.random.key(0)
    B, P, S, u = 19, 10, 9, 5  # non-multiple of the tile to exercise padding
    x = 4.0 * jax.random.normal(key, (B, P))
    y = 4.0 * jax.random.normal(jax.random.fold_in(key, 1), (B, P))
    w = 500.0 + jax.random.normal(jax.random.fold_in(key, 2), (B, P))
    sigma = 5.96
    ours = np.asarray(pallas_render_frames(x, y, w, sigma, S, u, interpret=True))
    ref = np.asarray(render_frames_core(x, y, w, sigma, S, u))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_render_backend_switch():
    """set_render_backend('pallas') routes the full video pipeline through
    the kernel (interpret mode off-TPU) and matches the XLA backend; per-PSF
    sigma arrays fall back to XLA inside the pallas backend."""
    from moleculardiffusion_mivit_tpu.config import BASELINE_OPTICS
    from moleculardiffusion_mivit_tpu.sim import trajectories_to_video

    key = jax.random.key(7)
    trajs = 0.02 * jax.random.normal(key, (6, 60, 2)).cumsum(axis=1)
    ref = np.asarray(trajectories_to_video(key, trajs, 10, True, BASELINE_OPTICS))
    try:
        set_render_backend("pallas")
        ours = np.asarray(trajectories_to_video(key, trajs, 10, True, BASELINE_OPTICS))
        # broadcastable (non-scalar) sigma exercises the XLA fallback branch
        b = render_frames_core(
            jnp.zeros((2, 3, 4)), jnp.zeros((2, 3, 4)), jnp.ones((2, 3, 4)),
            jnp.array([[5.0], [6.0]])[:, :, None] * jnp.ones((2, 3, 4)), 9, 5,
        )
        assert b.shape == (2, 3, 9, 9)
    finally:
        set_render_backend("xla")
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    import pytest

    with pytest.raises(ValueError, match="backend"):
        set_render_backend("cuda")


def test_pallas_backend_unprofitable_size_falls_back_with_warning():
    """The 13×13 regime (the Framerate experiment's patch size) measured
    4.4× SLOWER on the kernel than on XLA's fused path (RESULTS.md renderer
    table), so the pallas backend must route it to XLA — with a one-time
    warning, never silently — while 9×9 stays on the kernel."""
    import warnings

    import pytest

    from moleculardiffusion_mivit_tpu.ops import pallas_render

    key = jax.random.key(5)
    B, P, u = 8, 10, 5
    x = 4.0 * jax.random.normal(key, (B, P))
    y = 4.0 * jax.random.normal(jax.random.fold_in(key, 1), (B, P))
    w = 500.0 + jax.random.normal(jax.random.fold_in(key, 2), (B, P))
    ref13 = np.asarray(render_frames_core(x, y, w, 5.96, 13, u))
    pallas_render._warned_unprofitable.discard(13)
    try:
        set_render_backend("pallas")
        with pytest.warns(UserWarning, match="measured-profitable regime"):
            got13 = np.asarray(render_frames_core(x, y, w, 5.96, 13, u))
        # warning is once-per-size: a second call must stay silent
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            np.asarray(render_frames_core(x, y, w, 5.96, 13, u))
        got9 = np.asarray(render_frames_core(x, y, w, 5.96, 9, u))
    finally:
        set_render_backend("xla")
    np.testing.assert_array_equal(got13, ref13)  # identical = same XLA path
    ref9 = np.asarray(render_frames_core(x, y, w, 5.96, 9, u))
    np.testing.assert_allclose(got9, ref9, rtol=1e-5, atol=1e-4)


def test_pallas_renderer_even_grid():
    """Even output_size*upsampling grids have non-unit linspace spacing
    ((g-2)/(g-1)); the kernel's closed-form peak normalization must find
    the nearest grid point under that spacing too."""
    key = jax.random.key(3)
    B, P, S, u = 16, 4, 10, 5  # grid_size = 50, even
    x = 4.0 * jax.random.normal(key, (B, P))
    y = 4.0 * jax.random.normal(jax.random.fold_in(key, 1), (B, P))
    w = 500.0 + jax.random.normal(jax.random.fold_in(key, 2), (B, P))
    sigma = 5.96
    ours = np.asarray(pallas_render_frames(x, y, w, sigma, S, u, interpret=True))
    ref = np.asarray(render_frames_core(x, y, w, sigma, S, u))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)

"""Per-frame feature tokens for the ModularTransformer.

The reference built a per-frame-feature-token pathway into ModularTransformer
(helpers/models.py:459-467: one embedded feature token per frame, fused with
the image token by add / concat_proj / concat_features) but never defined a
per-frame feature extractor nor trained the model. Here the tokens are causal
kinematic features of the frame-averaged trajectory, so the model can be
trained and evaluated end-to-end (see ``experiments.modular``).

All features at frame ``i`` use only positions up to ``i`` (causal), so the
tokens are valid for sequence-mode / change-point use as well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PER_FRAME_FEATURE_NAMES = [
    "dx",  # displacement x since previous frame (0 at frame 0)
    "dy",  # displacement y since previous frame
    "step_sq",  # squared step length
    "running_msd1",  # running mean of step_sq up to this frame (MSD tau=1 estimate)
    "dist_from_start",  # |r_i - r_0|
    "time_frac",  # i / (T-1)
]
N_PER_FRAME_FEATURES = len(PER_FRAME_FEATURE_NAMES)


@jax.jit
def compute_per_frame_features(trajs_avg: jax.Array) -> jax.Array:
    """``(N, T, 2)`` frame-averaged positions → ``(N, T, 6)`` causal tokens.

    Features are in trajectory units per frame (displacements, not
    velocities) — the learned embeddings absorb any constant time scaling."""
    n, t, _ = trajs_avg.shape
    disp = jnp.diff(trajs_avg, axis=1)
    disp = jnp.concatenate([jnp.zeros((n, 1, 2), trajs_avg.dtype), disp], axis=1)
    step_sq = (disp**2).sum(-1)
    # running mean over frames 1..i (frame 0 has no displacement yet)
    counts = jnp.maximum(jnp.arange(t, dtype=trajs_avg.dtype), 1.0)
    running_msd1 = jnp.cumsum(step_sq, axis=1) / counts
    dist_from_start = jnp.sqrt(
        ((trajs_avg - trajs_avg[:, :1]) ** 2).sum(-1) + 1e-12
    )
    time_frac = jnp.broadcast_to(
        jnp.arange(t, dtype=trajs_avg.dtype) / max(t - 1, 1), (n, t)
    )
    return jnp.stack(
        [disp[..., 0], disp[..., 1], step_sq, running_msd1, dist_from_start, time_frac],
        axis=-1,
    )

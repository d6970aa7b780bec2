"""Change-point analysis for sequence-mode (per-frame) predictions.

The reference's sequence-mode experiments train per-frame D predictors on
tail-swapped trajectories (trainModels.py:157-194) and analyze them with
sliding-window change-point plots (tests/train_tests/
train_results_sequences.ipynb). This module provides the detection itself as
a vectorized function: for each sequence, find the frame where the mean
prediction before/after differs most (two-window scan), with a detectability
score relative to the prediction noise.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def detect_change_points(
    per_frame_predictions: jax.Array, min_margin: int = 3
) -> Tuple[jax.Array, jax.Array]:
    """per_frame_predictions ``(N, T)`` → ``(split_idx (N,), score (N,))``.

    For each candidate split s the statistic is
    ``|mean(pred[:s]) − mean(pred[s:])| / pooled_std``; the returned split
    maximizes it over ``s ∈ [min_margin, T − min_margin]``. A score ≲ 1
    means no detectable transition (constant-D sequence).
    """
    preds = jnp.asarray(per_frame_predictions, jnp.float32)
    n, t = preds.shape
    idx = jnp.arange(t, dtype=jnp.float32)

    def stat_at(s):
        left = idx < s
        right = ~left
        nl = jnp.sum(left)
        nr = t - nl
        ml = jnp.sum(preds * left, axis=1) / nl
        mr = jnp.sum(preds * right, axis=1) / nr
        vl = jnp.sum(((preds - ml[:, None]) * left) ** 2, axis=1) / jnp.maximum(nl - 1, 1)
        vr = jnp.sum(((preds - mr[:, None]) * right) ** 2, axis=1) / jnp.maximum(nr - 1, 1)
        pooled = jnp.sqrt((vl + vr) / 2.0 + 1e-12)
        return jnp.abs(ml - mr) / pooled

    splits = jnp.arange(min_margin, t - min_margin + 1)
    stats = jax.vmap(stat_at)(splits.astype(jnp.float32))  # (S, N)
    best = jnp.argmax(stats, axis=0)
    return splits[best], jnp.max(stats, axis=0)

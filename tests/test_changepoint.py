import jax.numpy as jnp
import numpy as np

from moleculardiffusion_mivit_tpu.evaluation import detect_change_points


def test_detects_planted_transition():
    rng = np.random.default_rng(0)
    n, t = 16, 30
    preds = np.full((n, t), 1.0) + 0.2 * rng.normal(size=(n, t))
    true_splits = rng.integers(10, 20, size=n)
    for i, s in enumerate(true_splits):
        preds[i, s:] += 5.0  # D jumps from ~1 to ~6
    splits, scores = detect_change_points(jnp.asarray(preds, jnp.float32))
    err = np.abs(np.asarray(splits) - true_splits)
    assert (err <= 1).mean() >= 0.9
    assert np.asarray(scores).min() > 5.0


def test_constant_sequences_score_low():
    rng = np.random.default_rng(1)
    preds = 3.0 + 0.3 * rng.normal(size=(16, 30))
    _, scores = detect_change_points(jnp.asarray(preds, jnp.float32))
    assert np.asarray(scores).max() < 3.0

"""L8 figure layer: every plot regenerates from committed artifacts alone."""

import json
import os

import numpy as np

from moleculardiffusion_mivit_tpu.evaluation import plots


def test_render_all_from_artifacts(tmp_path):
    history = {
        "m1": {"val_avg": [3.0, 2.0, 1.0], "val_1": [1.0, 1.0, 1.0]},
        "m2": {"val_avg": [4.0, 3.0, 2.0]},
    }
    (tmp_path / "history.json").write_text(json.dumps(history))
    with open(tmp_path / "demo_errors.csv", "w") as f:
        f.write(
            "model,mse,std\n"
            "tr_0_0,0.5,0.1\ntr_0_1,0.6,0.1\ntr_1_0,0.4,0.1\ntr_1_1,0.7,0.1\n"
            "res_0_0,0.9,0.2\n"
        )
    rng = np.random.default_rng(0)
    np.savez_compressed(
        tmp_path / "in_order_predictions.npz",
        d_values=np.array([1.0, 2.0]),
        m1=rng.uniform(0.5, 2.5, (2, 5)),
        m2=rng.uniform(0.5, 2.5, (2, 5)),
    )

    (tmp_path / "inference_times.json").write_text(
        json.dumps({"tr_0_0": [1.5, 0.1], "res_0_0": [30.0, 2.0], "absent": [9.9, 0.0]})
    )

    made = plots.render_all(str(tmp_path))
    expected = {
        "history",
        "demo_bars",
        "heatmap_tr",
        "heatmap_res",
        "pred_vs_d",
        "violins",
        "accuracy_vs_cost",
    }
    assert expected <= set(made), sorted(made)
    for path in made.values():
        assert os.path.exists(path) and os.path.getsize(path) > 0


def test_changepoint_detection_plot(tmp_path):
    """The round-5 changepoint figure renders from the study's committed
    JSON (CI format) via render_all, tolerates a missing arm, and rejects
    an armless report."""
    import pytest

    def arm(auc, rates):
        return {
            "roc_auc": auc,
            "false_positive_rate": 0.05,
            "by_contrast": {
                f"dD={d}": {
                    "n": 30,
                    "detection_rate": r,
                    "ci95": [max(0.0, r - 0.1), min(1.0, r + 0.1)],
                }
                for d, r in rates.items()
            },
        }

    report = {
        "n_mixed": 60,
        "seed": 0,
        "mod_images": arm(0.85, {1: 0.1, 2: 0.2, 4: 0.5}),
        "mod_both_concat": arm(0.94, {1: 0.3, 2: 0.7, 4: 0.95}),
        # mod_hybrid absent: partial reports must still render
    }
    (tmp_path / "changepoint_modular.json").write_text(json.dumps(report))
    made = plots.render_all(str(tmp_path))
    assert "changepoint_detection" in made
    assert os.path.getsize(made["changepoint_detection"]) > 0

    with pytest.raises(ValueError):
        plots.plot_changepoint_detection({"cycles": 1}, str(tmp_path / "x.png"))


def test_accuracy_vs_cost_requires_overlap(tmp_path):
    import pytest

    with pytest.raises(ValueError):
        plots.plot_accuracy_vs_cost(
            {"a": (1.0, 0.1)}, {"b": {"mse": 0.5}}, str(tmp_path / "x.png")
        )


def test_msd_vs_lag_plot(tmp_path):
    rng = np.random.default_rng(1)
    trajs = np.cumsum(rng.normal(0, 1.0, (20, 50, 2)), axis=1)
    out = plots.plot_msd_vs_lag(trajs, str(tmp_path / "msd.png"))
    assert os.path.getsize(out) > 0

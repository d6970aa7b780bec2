import json
import os

import pytest
import subprocess
import sys


@pytest.mark.slow
def test_run_experiment_cli(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # conftest doesn't apply to subprocesses
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from moleculardiffusion_mivit_tpu.run_experiment import main;"
        f"main(['baseline','--cycles','1','--seqs-per-d','4','--out',r'{tmp_path}',"
        "'--checkpoint-last','0','--unroll','2'])"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True, timeout=900
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(tmp_path / "metrics.jsonl")
    assert os.path.exists(tmp_path / "history.json")
    assert os.path.isdir(tmp_path / "final")
    history = json.load(open(tmp_path / "history.json"))
    assert "resnet" in history and len(history["resnet"]["val_avg"]) == 1


def test_run_experiment_cli_plumbing_fast(tmp_path, monkeypatch):
    """The CLI's full plumbing (arg parsing, logger, build, run, final
    save, history dump) through a registered tiny experiment — the fast
    default-profile coverage for run_experiment.main; the slow test above
    exercises the real baseline regime end-to-end in a subprocess."""
    import jax
    import jax.numpy as jnp

    from moleculardiffusion_mivit_tpu.config import (
        BASELINE_OPTICS,
        ModelConfig,
        TrainConfig,
    )
    from moleculardiffusion_mivit_tpu.experiments import REGISTRY
    from moleculardiffusion_mivit_tpu.experiments.base import Experiment, ModelEntry
    from moleculardiffusion_mivit_tpu.models import GeneralTransformer
    from moleculardiffusion_mivit_tpu.run_experiment import main
    from moleculardiffusion_mivit_tpu.train.loop import generate_cycle_data

    def tiny_builder(seed=0, sequences_per_d=2):
        train_cfg = TrainConfig(
            seed=seed,
            num_cycles=1,
            sequences_per_d=2,
            training_ds=((1, 1), (5, 1)),
            n_frames=4,
            n_pos_per_frame=3,
        )
        model = GeneralTransformer(
            ModelConfig(embed_dim=16, num_heads=2, hidden_dim=32, num_layers=1),
            embedding="linear",
        )

        def generate_fn(key):
            videos, labels, _ = generate_cycle_data(key, train_cfg, BASELINE_OPTICS)
            return {"videos": videos, "labels": labels}

        def slice_fn(data):
            return data["videos"], None, data["labels"]

        v, _, _ = generate_cycle_data(jax.random.key(seed + 7), train_cfg, BASELINE_OPTICS)
        val_data = {
            1.0: {"videos": v, "labels": jnp.zeros((v.shape[0], 1), jnp.float32)}
        }
        return Experiment(
            "tiny",
            train_cfg,
            BASELINE_OPTICS,
            {"tiny_vit": ModelEntry(model=model, slice_fn=slice_fn)},
            generate_fn,
            val_data,
        )

    monkeypatch.setitem(REGISTRY, "tiny", tiny_builder)
    main(["tiny", "--cycles", "1", "--out", str(tmp_path), "--checkpoint-last", "0"])
    assert os.path.exists(tmp_path / "metrics.jsonl")
    history = json.load(open(tmp_path / "history.json"))
    assert "tiny_vit" in history and len(history["tiny_vit"]["val_avg"]) == 1
    events = [json.loads(l)["event"] for l in open(tmp_path / "metrics.jsonl")]
    assert {"start", "built", "trained", "final_val_avg"} <= set(events)

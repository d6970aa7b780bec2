import json
import os
import subprocess
import sys


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

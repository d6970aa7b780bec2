"""Checkpointing with restore-and-continue.

The reference is save-only: ``torch.save({validation_losses, all_labels,
model_weights})`` at the end (trainModels.py:270-277) plus the last five
cycles of the experiment scripts (trainModelsPSFNoise.py:241-242); analysis
notebooks rebuild models and ``load_state_dict``. Here checkpoints are orbax
pytrees of the FULL experiment state — parameters, BatchNorm statistics AND
optimizer state — plus the history dict, so training can resume exactly.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

try:  # orbax is the preferred backend
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_pytree(tree: Any, path: str) -> None:
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, tree, force=True)
    else:  # flat-npz fallback
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "tree.npz"),
            **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat},
        )


def restore_pytree(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (an example pytree)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path, item=target)
        return restored
    data = np.load(os.path.join(path, "tree.npz"))
    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    leaves = [data[jax.tree_util.keystr(k)] for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_experiment(exp, path: str) -> None:
    """Persist states (params + batch_stats + optimizer) and history."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    save_pytree(exp.states, os.path.join(path, "states"))
    with open(os.path.join(path, "history.json"), "w") as f:
        json.dump(exp.history, f)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"name": exp.name, "model_names": exp.model_names}, f)


def restore_experiment(exp, path: str) -> None:
    """Restore a previously saved experiment into a built ``Experiment`` —
    the experiment must be built (same arms/configs) before restoring."""
    path = os.path.abspath(path)
    if not exp._built:
        exp.build()
    exp.states = restore_pytree(os.path.join(path, "states"), exp.states)
    with open(os.path.join(path, "history.json")) as f:
        exp.history = json.load(f)

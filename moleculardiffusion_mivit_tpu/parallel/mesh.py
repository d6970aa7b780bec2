"""Device mesh construction and sharding helpers.

The reference has no distributed backend at all (single process, single GPU;
SURVEY.md §5): its only scalable axes are the *batch* of generated sequences
and the *grid of independent small models* trained per experiment. On TPU
those map onto a 2-D ``Mesh``:

- ``data`` axis: batch-sharded generation + training (the gradient reduction
  is a ``psum`` over ICI inserted by XLA from sharding annotations);
- ``model`` axis: the vmapped model-grid dimension (e.g. PSFNoise's 5×6×2
  grid) sharded across chips — embarrassingly parallel, zero collectives.

Layouts are chosen so all collectives ride ICI; nothing here needs DCN. A
second host axis can be added to the mesh without touching callers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for stacked model-grid pytrees: leading axis over 'model'."""
    return NamedSharding(mesh, P("model"))


def shard_grid(grid, mesh: Mesh):
    """Place a stacked ``ModelGrid`` / pytree with its leading (model) axis
    sharded across the mesh's model axis; other axes replicated."""
    sharding = grid_sharding(mesh)

    def place(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(place, grid)

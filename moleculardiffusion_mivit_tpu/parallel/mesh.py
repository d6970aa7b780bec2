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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host entry hook: call ONCE per process, before any other jax
    use, on every host of a multi-host (DCN-connected) deployment.

    Wraps ``jax.distributed.initialize``; afterwards ``jax.devices()``
    returns the GLOBAL device list, so ``make_mesh`` (and everything built
    on it — ``make_sharded_grid_fns``, ``Experiment.use_mesh``) transparently
    spans hosts: pass the global ``data``/``model`` factors and lay the
    mesh out so the 'model' axis (embarrassingly parallel grid arms, zero
    collectives) crosses the DCN boundary while 'data' (whose gradient
    psum is the only hot collective) stays within each host's ICI domain —
    ``make_mesh``'s row-major device order does this when ``model`` is the
    slower-varying factor of a host-major device list, i.e. pass
    ``model=n_hosts`` (or a multiple). See docs/DESIGN.md §"Multi-host".

    On TPU pods all three arguments are inferred from the environment; on
    CPU/GPU (or for tests) pass them explicitly. Single-process use needs
    no call at all — this hook is the *only* thing that changes multi-host
    (SURVEY.md §5: "design the mesh code so a second axis can be added").
    Idempotent: repeat calls after a successful initialize are no-ops.
    """
    if jax._src.distributed.global_state.client is not None:  # already up
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


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

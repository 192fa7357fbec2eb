"""Mesh and sharding policies for multi-chip training/eval.

The reference has no working distributed layer (its DDP path raises
NotImplementedError, NeRAF_pipeline.py:154-155). The TPU-native design
(SURVEY.md §5.8) is SPMD over a device mesh:

- **data axis**: ray batches, STFT-slice batches, grid-bake cell queries and
  the eval RIR sweep shard along their batch dimension; parameters, the
  scene grid and optimizer states are replicated. Gradient psums ride ICI —
  inserted automatically by XLA from the sharding constraints (no hand-rolled
  collectives, per the scaling-book recipe).
- **model axis** (optional, later): tensor-sharding of the 5096-wide
  acoustic MLP and spatial sharding of the conv3d encoder.

Everything is expressed with jax.sharding.NamedSharding constraints inside
the already-jitted step functions, so single-device runs compile identically
(constraints are no-ops on a 1-device mesh).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def make_mesh_2d(data: int, model: int, devices=None) -> Mesh:
    """(data, model) mesh: batch sharding x tensor sharding of wide MLPs.

    Lay the model axis innermost so tensor-parallel collectives ride
    neighboring ICI links (scaling-book layout rule).
    """
    if devices is None:
        devices = jax.devices()
    need = data * model
    if len(devices) < need:
        raise ValueError(f"requested {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def mesh_axis(mesh: Mesh, name: str) -> bool:
    return mesh is not None and name in mesh.axis_names


def param_shardings(params, mesh: Mesh, min_dim: int = 1024):
    """NamedShardings for a params pytree: shard the output axis of large
    Dense kernels over 'model'; replicate everything else.

    With batch activations sharded over 'data' and wide kernels column-
    sharded over 'model', XLA inserts the all-gathers/reduce-scatters; the
    acoustic field's 5096/2048-wide layers are the targets.
    """
    if not mesh_axis(mesh, "model"):
        rep = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda _: rep, params)

    def shard_leaf(x):
        if getattr(x, "ndim", 0) == 2 and x.shape[-1] >= min_dim:
            return NamedSharding(mesh, P(None, "model"))
        if getattr(x, "ndim", 0) == 1 and x.shape[-1] >= min_dim:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(shard_leaf, params)


def apply_param_shardings(params, mesh: Mesh, min_dim: int = 1024):
    """device_put the params pytree according to param_shardings."""
    shardings = param_shardings(params, mesh, min_dim)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree_batch(tree: Any, mesh: Mesh) -> Any:
    """Constrain every leaf's leading axis to the data axis (inside jit)."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, s), tree)

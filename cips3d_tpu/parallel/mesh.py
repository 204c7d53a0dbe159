"""Device mesh + sharding helpers.

TPU-native replacement for the reference's DDP/NCCL setup
(`exp/cips3d/scripts/train.py:41-53,235-236,603-607`): instead of one process
per GPU with gradient allreduce, we run a single program over a
`jax.sharding.Mesh` and let XLA insert the collectives (psum over ICI for the
replicated-parameter gradients).

Axes:
  * ``data`` — batch data parallelism (the reference's DDP axis).
  * ``rays`` — optional pixel/ray-axis sharding for huge-image rendering;
    rays are embarrassingly parallel so this needs no collectives until the
    final gather (SURVEY §2.6).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default: 1-D data-parallel mesh over all devices.  Pass
    ``axis_names=("data", "rays")`` with ``shape=(d, r)`` for a 2-D mesh.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over ``axis``."""
    return NamedSharding(mesh, P(axis))


def shard_train_step(step_fn, mesh: Mesh):
    """jit the train step with params replicated and the batch sharded over
    'data'.  XLA inserts the gradient all-reduce (the DDP allreduce analogue)
    over ICI."""
    rep = replicated(mesh)
    data = batch_sharded(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with dim 0 sharded over 'data'."""
    return jax.device_put(batch, batch_sharded(mesh))

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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Wire `jax.distributed.initialize` — the DCN / multi-host analogue of
    the reference's `dist.init_process_group("nccl")`
    (`exp/cips3d/scripts/train.py:41-53,603-607`).

    Arguments default to the env vars CIPS3D_COORDINATOR,
    CIPS3D_NUM_PROCESSES, CIPS3D_PROCESS_ID (torchrun-style single-var
    launch).  No-op (returns False) when no multi-process config is present,
    so single-host runs need nothing.  Must be called before any jax
    operation.
    """
    coordinator_address = coordinator_address or os.environ.get("CIPS3D_COORDINATOR")
    if num_processes is None and "CIPS3D_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["CIPS3D_NUM_PROCESSES"])
    if process_id is None and "CIPS3D_PROCESS_ID" in os.environ:
        process_id = int(os.environ["CIPS3D_PROCESS_ID"])
    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


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


def host_barrier(name: str, timeout_s: float = 600.0) -> bool:
    """Rendezvous all processes through the coordination service — NOT a
    device collective.  No-op (False) when single-process or uninitialized.

    Used before the first collective dispatch: per-host compile-cache
    asymmetry can skew hosts' arrival at the first collective by minutes,
    and the CPU backend's Gloo context init has a hard 30 s window (real
    TPU rendezvous through PJRT and is far more tolerant, but the barrier
    is harmless there).  Each call site must use a distinct ``name`` and be
    reached by every process.
    """
    if jax.process_count() <= 1:
        return False
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return False
    client.wait_at_barrier(name, int(timeout_s * 1000))
    return True


def shard_chunk_train_step(chunk_fn, mesh: Mesh):
    """jit a multi-step chunk fn (state, reals (K, B, ...), key) →
    (state, stacked_metrics) with params replicated and the batch axis
    (dim 1) sharded over 'data'.  One dispatch executes K train steps via
    `lax.scan` — through a remote-device tunnel, per-step dispatch costs
    ~0.3 s/step of host round-trips that a scanned chunk amortizes."""
    rep = replicated(mesh)
    data = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        chunk_fn,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def shard_chunk_batch(batch, mesh: Mesh):
    """Device-put a stacked (K, local_B, ...) chunk of batches with dim 1
    (batch) sharded over 'data'."""
    sharding = NamedSharding(mesh, P(None, "data"))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with dim 0 sharded over 'data'.

    Multi-process: ``batch`` is this process's LOCAL shard (the loader is
    process-sharded); the global array is assembled from per-process data —
    the per-host data-sharding analogue of the reference's
    DistributedSampler (`train.py:301-304`)."""
    sharding = batch_sharded(mesh)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)

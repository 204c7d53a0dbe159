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

import contextlib
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
    data = NamedSharding(mesh, batch_spec(mesh))
    return jax.jit(
        step_fn,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


# --------------------------------------------------------------------------- #
# 2-D (data x rays) training mesh
#
# Rays are pointwise-parallel through the whole generator (SIREN point MLP,
# compositing, and the per-pixel CIPS INR decoder), so sharding the pixel axis
# needs no collectives until the fake image meets the discriminator's spatial
# convs.  There we reshard the image batch onto the JOINT (data, rays) axis —
# one all-to-all inserted by XLA — and D runs pure data-parallel over all
# devices.  Gradient psums ride the mesh automatically (params replicated).
#
# Plumbing: `pixel_sharding_scope` stashes the active mesh/axes in a module
# global consulted by `constrain_pixels` (called inside
# `GeneratorNerfINR.points_forward`) and `constrain_joint_batch` (called in
# the train step around the D apply).  Both are identity when no scope is
# active, so the 1-D path pays nothing.

_PIXEL_SCOPE: Optional[dict] = None


@contextlib.contextmanager
def pixel_sharding_scope(
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    rays_axis: Optional[str] = "rays",
):
    """Activate pixel-axis sharding for generator traces in this scope.

    Either axis may be ``None`` to leave that dim unsharded:

    * ``rays_axis=None`` — the 1-D (batch-only) training form: generator
      arrays are constrained to P(data) on dim 0.
    * ``data_axis=None`` — the serving form (`apps/render.render_sharded`):
      batch replicated, the pixel axis sharded for huge-image rendering.

    Crucially, the fused Pallas kernels inside the scope are wrapped in
    `shard_map` over the mesh (`pixel_shard_map`).  On real multi-chip TPU
    GSPMD cannot partition a Mosaic custom call ("Mosaic kernels cannot be
    automatically partitioned — wrap in shard_map"), so ANY mesh-sharded
    trace that reaches a fused kernel must run under a scope; the CPU
    simulation only tolerates the unwrapped form because interpret-mode
    Pallas lowers to ordinary partitionable XLA ops.
    """
    global _PIXEL_SCOPE
    prev = _PIXEL_SCOPE
    _PIXEL_SCOPE = {"mesh": mesh, "data": data_axis, "rays": rays_axis}
    try:
        yield
    finally:
        _PIXEL_SCOPE = prev


def pixel_scope_active() -> bool:
    return _PIXEL_SCOPE is not None


@contextlib.contextmanager
def pixel_sharding_suspended():
    """Temporarily deactivate the pixel scope for host-side eval/monitor
    rendering.  Eval images are per-host work (interleaved shards, plain
    `jit`, host fetch via np.asarray): tracing them under the training
    scope attaches the GLOBAL 2-D mesh sharding to their outputs, which a
    host cannot fetch once the mesh spans processes ("spans non-addressable
    devices" — caught by tests/test_multihost.py's 2-process 2-D-mesh run;
    invisible on the single-process 8-device sim where every shard is
    addressable).  Eval memory at high res is handled by forward_points
    chunking, not ray sharding, so no capability is lost."""
    global _PIXEL_SCOPE
    prev = _PIXEL_SCOPE
    _PIXEL_SCOPE = None
    try:
        yield
    finally:
        _PIXEL_SCOPE = prev


def constrain_pixels(x):
    """Constrain a (b, n_pixels, ...) generator array to
    P(data, rays, None, ...).  Identity outside a pixel_sharding_scope, and
    identity for arrays whose leading dims don't divide the mesh (e.g. small
    monitor-render batches traced while the scope is active)."""
    if _PIXEL_SCOPE is None or x is None:
        return x
    s = _PIXEL_SCOPE
    sizes = dict(zip(s["mesh"].axis_names, s["mesh"].devices.shape))
    data_size = sizes[s["data"]] if s["data"] is not None else 1
    rays_size = sizes[s["rays"]] if s["rays"] is not None else 1
    if (
        x.ndim < 2
        or x.shape[0] % data_size != 0
        or x.shape[1] % rays_size != 0
    ):
        return x
    spec = P(s["data"], s["rays"], *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(s["mesh"], spec))


def constrain_joint_batch(x):
    """Constrain an NCHW image batch to P((data, rays), None, ...) — the
    discriminator's pure batch-parallel layout over the whole mesh.  Identity
    outside a pixel_sharding_scope or when the batch doesn't divide the
    mesh."""
    if _PIXEL_SCOPE is None or x is None:
        return x
    s = _PIXEL_SCOPE
    axes = tuple(a for a in (s["data"], s["rays"]) if a is not None)
    if not axes:
        return x
    sizes = dict(zip(s["mesh"].axis_names, s["mesh"].devices.shape))
    total = int(np.prod([sizes[a] for a in axes]))
    if x.shape[0] % total != 0:
        return x
    joint = axes if len(axes) > 1 else axes[0]
    spec = P(joint, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(s["mesh"], spec))


def pixel_shard_map(fn, b: int, n: int, in_kinds, out_kinds):
    """Wrap a pointwise-over-(batch, pixels) kernel invocation in
    `jax.shard_map` over the active pixel scope's mesh.

    Required for the fused Pallas kernels on real multi-chip TPU: GSPMD
    cannot auto-partition a Mosaic custom call ("Mosaic kernels cannot be
    automatically partitioned. Please wrap the call in a shard_map" —
    surfaced by the r512 8-chip AOT compile, tools/compile_r512.py).  The
    kernels are pointwise over (batch, pixel) tiles, so sharding them is a
    pure grid split: no collectives in the forward, and the backward's
    replicated-weight cotangents get the correct mesh-wide psum from the
    shard_map transpose of a P() input.

    ``in_kinds`` / ``out_kinds``: pytrees matching fn's args / outputs with
    string leaves — "bp" (dim 0 = batch over the data axis, dim 1 = pixels
    over the rays axis), "b" (dim 0 = batch only), "rep" (replicated).

    Identity when no scope is active or when (b, n) don't divide the mesh
    (mirroring `constrain_pixels`' guard: such traces keep replicated
    inputs, which Mosaic accepts on one device).
    """
    s = _PIXEL_SCOPE
    if s is None:
        return fn
    mesh, data, rays = s["mesh"], s["data"], s["rays"]
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    data_size = sizes[data] if data is not None else 1
    rays_size = sizes[rays] if rays is not None else 1
    if b % data_size != 0 or n % rays_size != 0:
        return fn

    to_spec = {"bp": P(data, rays), "b": P(data) if data else P(), "rep": P()}
    in_specs = jax.tree_util.tree_map(lambda k: to_spec[k], in_kinds)
    out_specs = jax.tree_util.tree_map(lambda k: to_spec[k], out_kinds)
    # check_vma=False: the kernels carry custom_vjp rules, which the
    # replication checker does not see through.
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec for an image batch's dim 0: the joint (data, rays) axis
    on a 2-D mesh (D is batch-parallel over every device), plain 'data'
    otherwise."""
    if "rays" in mesh.axis_names:
        return P(("data", "rays"))
    return P("data")


def shard_train_step_2d(step_fn, mesh: Mesh):
    """jit the train step over a 2-D (data, rays) mesh: params replicated,
    the real-image batch sharded over the JOINT (data, rays) axis (D is
    batch-parallel over every device; G's pixel axis is sharded via the
    `constrain_pixels` annotations inside points_forward).  `batch_spec`
    makes `shard_train_step` mesh-aware, so this is the same function —
    kept as the explicit 2-D entry point."""
    return shard_train_step(step_fn, mesh)


def shard_joint_batch(batch, mesh: Mesh):
    """Device-put a host batch with dim 0 sharded over the joint
    (data, rays) axis."""
    sharding = NamedSharding(mesh, P(("data", "rays")))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


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
    import time as _time

    t0 = _time.time()
    try:
        client.wait_at_barrier(name, int(timeout_s * 1000))
    except Exception as e:
        # A hung/dead peer used to surface as an opaque RPC error after the
        # full timeout; name the barrier, this process, and the wait time so
        # the stuck host is identifiable from any one log.
        raise RuntimeError(
            f"host_barrier {name!r} failed after {_time.time() - t0:.0f}s "
            f"(timeout {timeout_s:.0f}s) on process "
            f"{jax.process_index()}/{jax.process_count()} — a peer likely "
            f"died or is still compiling; check the other hosts' logs for "
            f"the last barrier they reached"
        ) from e
    waited = _time.time() - t0
    if waited > 0.25 * timeout_s:
        print(
            f"[mesh] host_barrier {name!r}: process {jax.process_index()} "
            f"waited {waited:.0f}s of the {timeout_s:.0f}s budget — peers "
            "are arriving dangerously late (compile-cache asymmetry?)",
            flush=True,
        )
    return True


def shard_chunk_train_step(chunk_fn, mesh: Mesh):
    """jit a multi-step chunk fn (state, reals (K, B, ...), key) →
    (state, stacked_metrics) with params replicated and the batch axis
    (dim 1) sharded over 'data'.  One dispatch executes K train steps via
    `lax.scan` — through a remote-device tunnel, per-step dispatch costs
    ~0.3 s/step of host round-trips that a scanned chunk amortizes."""
    rep = replicated(mesh)
    data = NamedSharding(mesh, P(None, *batch_spec(mesh)))
    return jax.jit(
        chunk_fn,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def shard_chunk_batch(batch, mesh: Mesh):
    """Device-put a stacked (K, local_B, ...) chunk of batches with dim 1
    (batch) sharded over 'data' (joint (data, rays) on a 2-D mesh)."""
    sharding = NamedSharding(mesh, P(None, *batch_spec(mesh)))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with dim 0 sharded over 'data'.

    Multi-process: ``batch`` is this process's LOCAL shard (the loader is
    process-sharded); the global array is assembled from per-process data —
    the per-host data-sharding analogue of the reference's
    DistributedSampler (`train.py:301-304`)."""
    sharding = NamedSharding(mesh, batch_spec(mesh))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)

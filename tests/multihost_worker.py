"""Worker process for the 2-process multi-host test (run via subprocess).

Usage: python multihost_worker.py <data_zip> <outdir> [ray_shards]
Env: CIPS3D_COORDINATOR, CIPS3D_NUM_PROCESSES, CIPS3D_PROCESS_ID.

With ray_shards=2 the loop builds the 2-D (data x rays) mesh across BOTH
processes — the r512 layout — so the generator's pixel axis is sharded over
a mesh axis that spans process boundaries and the joint-axis reshard before
D crosses hosts (round-3 verdict next #5).

Initializes a local jax.distributed cluster on CPU (2 local devices per
process -> 4 global), then runs the REAL training loop for 2 debug steps:
process-sharded data loading, a globally-replicated train state, the sharded
train step, per-host-interleaved eval image dumps, a cross-process barrier,
and process-0-only FID/checkpointing.  The multi-process analogue of the
reference's mp.spawn+NCCL path (`exp/cips3d/scripts/train.py:41-53,603-607`).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from cips3d_tpu.parallel.mesh import initialize_multihost  # noqa: E402

assert initialize_multihost(), "multihost env not set"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

from cips3d_tpu.models.generator import GeneratorConfig, RenderOptions  # noqa: E402
from cips3d_tpu.train.loop import LoopConfig, train  # noqa: E402
from cips3d_tpu.train.state import TrainConfig  # noqa: E402

TINY = {r: 16 for r in (4, 8, 16, 32, 64, 128, 256, 512, 1024)}
GCFG = GeneratorConfig(
    z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=16, nerf_style_dim=16,
    nerf_mapping_layers=2, inr_hidden_dim=32, inr_style_dim=32, inr_mapping_layers=2,
)


def main():
    data_zip, outdir = sys.argv[1], sys.argv[2]
    ray_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    # Per-step dispatch for the training run: the chunked path compiles a
    # much bigger program, and on the contended single-core CPU sim the two
    # processes reach the first Gloo collective > 30 s apart (Gloo's hard
    # context-init window) — a CPU-sim artifact only; real multi-host TPU
    # rendezvous through PJRT.  The multi-process piece of chunking
    # (shard_chunk_batch's make_array_from_process_local_data) is exercised
    # directly below instead.
    # 2-D mesh: batch_size must divide by ray_shards (the joint-axis reshard
    # puts D batch-parallel over ALL devices); (2 procs x 2 local devices,
    # ray_shards=2) -> mesh (data=2, rays=2), global batch 4, local batch 2
    tcfg = TrainConfig(
        img_size=8, batch_size=2 if ray_shards > 1 else 1,
        grad_points=None, total_iters=2, ema_start_itr=1,
    )
    opts = RenderOptions(img_size=8, num_steps=3)
    lcfg = LoopConfig(
        outdir=outdir, data_path=data_zip, log_every=1, eval_every=2,
        fixed_z_bs=2, num_workers=1, debug=True, dispatch_chunk=1,
        ray_shards=ray_shards,
    )
    state = train(
        GCFG, tcfg, opts, lcfg,
        disc_kwargs={"max_size": 16, "channels_override": TINY},
    )
    assert int(state.step) == 2

    # multi-process chunk batching: each process contributes its local
    # (K, local_B, ...) stack; the global array is (K, global_B, ...) with
    # dim 1 sharded over 'data'
    import numpy as np

    from cips3d_tpu.parallel.mesh import make_mesh, shard_chunk_batch

    mesh = make_mesh()
    local = np.full((3, 2, 1), float(jax.process_index()), np.float32)
    arr = shard_chunk_batch(local, mesh)
    assert arr.shape == (3, 4, 1), arr.shape
    for shard in arr.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), local[:, :1])
    print(f"WORKER_OK {jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()

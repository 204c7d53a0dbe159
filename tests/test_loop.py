"""End-to-end host-loop smoke test: synthetic zip dataset → 2 train steps →
eval (surrogate FID) → checkpoints (reference flow:
exp/cips3d/scripts/train.py:209-578 in tl_debug mode)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from cips3d_tpu.data.zip_dataset import write_stylegan_zip
from cips3d_tpu.models.generator import GeneratorConfig, RenderOptions
from cips3d_tpu.train.loop import LoopConfig, train
from cips3d_tpu.train.state import TrainConfig

TINY = {r: 16 for r in (4, 8, 16, 32, 64, 128, 256, 512, 1024)}
GCFG = GeneratorConfig(
    z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=16, nerf_style_dim=16,
    nerf_mapping_layers=2, inr_hidden_dim=32, inr_style_dim=32, inr_mapping_layers=2,
)


@pytest.fixture(scope="module")
def data_zip(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("data") / "d.zip")
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (8, 8, 3), dtype=np.uint8) for _ in range(8)]
    write_stylegan_zip(p, imgs)
    return p


class TestTrainLoopSmoke:
    def test_debug_run(self, data_zip, tmp_path):
        outdir = str(tmp_path / "run")
        tcfg = TrainConfig(
            img_size=8, batch_size=1, grad_points=None, total_iters=2, ema_start_itr=1
        )
        opts = RenderOptions(img_size=8, num_steps=3)
        lcfg = LoopConfig(
            outdir=outdir,
            data_path=data_zip,
            log_every=1,
            eval_every=2,
            fixed_z_bs=2,
            num_workers=1,
            debug=True,
        )
        state = train(
            GCFG,
            tcfg,
            opts,
            lcfg,
            disc_kwargs={"max_size": 16, "channels_override": TINY},
            n_devices=2,
        )
        assert int(state.step) == 2
        # checkpoint trees written
        assert os.path.isdir(os.path.join(outdir, "ckptdir", "resume"))
        assert os.path.isdir(os.path.join(outdir, "ckptdir", "best_fid"))
        # textlogger wrote train metrics
        logs = os.listdir(os.path.join(outdir, "textdir"))
        assert any("d_loss" in f for f in logs)
        assert any("FID" in f for f in logs)
        # fid image dirs populated
        assert len(os.listdir(os.path.join(outdir, "fid", "real"))) > 0
        assert len(os.listdir(os.path.join(outdir, "fid", "fake"))) > 0

    def test_resume(self, data_zip, tmp_path):
        outdir = str(tmp_path / "run2")
        tcfg = TrainConfig(
            img_size=8, batch_size=1, grad_points=None, total_iters=2, ema_start_itr=1
        )
        opts = RenderOptions(img_size=8, num_steps=3)
        lcfg = LoopConfig(
            outdir=outdir, data_path=data_zip, log_every=1, eval_every=2,
            fixed_z_bs=2, num_workers=1, debug=True,
        )
        kwargs = dict(disc_kwargs={"max_size": 16, "channels_override": TINY}, n_devices=2)
        first = train(GCFG, tcfg, opts, lcfg, **kwargs)
        # the resume tree must carry BOTH Adam states (exact resume; a
        # params-only restore silently resets the moments)
        resume_dir = os.path.join(outdir, "ckptdir", "resume")
        assert os.path.exists(os.path.join(resume_dir, "g_opt.npz"))
        assert os.path.exists(os.path.join(resume_dir, "d_opt.npz"))
        # resume: loads step 2; with total=2 (debug) the loop body is a no-op,
        # so the returned optimizer state is exactly the checkpointed one
        lcfg2 = dataclasses.replace(lcfg)
        state = train(GCFG, tcfg, opts, lcfg2, resume=True, **kwargs)
        assert int(state.step) >= 2
        for a, b in zip(
            jax.tree_util.tree_leaves(first.g_opt),
            jax.tree_util.tree_leaves(state.g_opt),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        mu_norms = [
            float(np.abs(np.asarray(x)).sum())
            for x in jax.tree_util.tree_leaves(state.d_opt)
        ]
        assert sum(mu_norms) > 0.0  # moments actually restored, not zeros


def test_final_eval_checkpoint(data_zip, tmp_path):
    """total_iters not a multiple of eval_every: the trailing steps must
    still reach the resume tree via the final eval+checkpoint."""
    import json

    outdir = str(tmp_path / "run3")
    tcfg = TrainConfig(
        img_size=8, batch_size=1, grad_points=None, total_iters=3, ema_start_itr=1
    )
    opts = RenderOptions(img_size=8, num_steps=3)
    lcfg = LoopConfig(
        outdir=outdir, data_path=data_zip, log_every=1, eval_every=2,
        num_images_real_eval=4, num_images_gen_eval=4, eval_batch_size=2,
        fixed_z_bs=2, num_workers=1,
    )
    state = train(GCFG, tcfg, opts, lcfg,
                  disc_kwargs={"max_size": 16, "channels_override": TINY},
                  n_devices=2)
    assert int(state.step) == 3
    with open(os.path.join(outdir, "ckptdir", "resume", "state.json")) as f:
        assert json.load(f)["step"] == 3


def test_chunked_dispatch(data_zip, tmp_path):
    """dispatch_chunk > 1: steps run as lax.scan chunks between eval
    boundaries, with per-step metric logs preserved."""
    outdir = str(tmp_path / "run4")
    tcfg = TrainConfig(
        img_size=8, batch_size=1, grad_points=None, total_iters=4, ema_start_itr=1
    )
    opts = RenderOptions(img_size=8, num_steps=3)
    lcfg = LoopConfig(
        outdir=outdir, data_path=data_zip, log_every=1, eval_every=4,
        num_images_real_eval=4, num_images_gen_eval=4, eval_batch_size=2,
        fixed_z_bs=2, num_workers=1, dispatch_chunk=2,
    )
    state = train(GCFG, tcfg, opts, lcfg,
                  disc_kwargs={"max_size": 16, "channels_override": TINY},
                  n_devices=2)
    # step 0 runs solo (step-0 eval boundary), steps 1-2 as one chunk, step 3 solo
    assert int(state.step) == 4
    log = os.path.join(outdir, "textdir", "train.d_loss.d_loss.log")
    with open(log) as f:
        steps = [int(line.split(":")[0]) for line in f if line.strip()]
    assert steps == [1, 2, 3, 4]  # per-step logs survive chunking


def test_ray_shards_loop(data_zip, tmp_path):
    """LoopConfig.ray_shards=2 on 4 devices: the full host loop (train steps,
    chunked dispatch, eval, checkpoints) runs on the 2-D (data=2, rays=2)
    mesh — the r512 recipe's layout (configs/ffhq.yaml train_r512)."""
    outdir = str(tmp_path / "run_rays")
    tcfg = TrainConfig(
        img_size=8, batch_size=2, grad_points=None, total_iters=4, ema_start_itr=1
    )
    opts = RenderOptions(img_size=8, num_steps=3)
    lcfg = LoopConfig(
        outdir=outdir, data_path=data_zip, log_every=1, eval_every=4,
        num_images_real_eval=4, num_images_gen_eval=4, eval_batch_size=2,
        fixed_z_bs=2, num_workers=1, dispatch_chunk=2, ray_shards=2,
    )
    state = train(GCFG, tcfg, opts, lcfg,
                  disc_kwargs={"max_size": 16, "channels_override": TINY},
                  n_devices=4)
    assert int(state.step) == 4
    assert os.path.isdir(os.path.join(outdir, "ckptdir", "resume"))
    log = os.path.join(outdir, "textdir", "train.d_loss.d_loss.log")
    with open(log) as f:
        steps = [int(line.split(":")[0]) for line in f if line.strip()]
    assert steps == [1, 2, 3, 4]


def test_multidevice_1d_wraps_fused_kernels(data_zip, tmp_path, monkeypatch):
    """Multi-device 1-D data-parallel training must trace under the pixel
    scope so the fused Pallas kernels go through `pixel_shard_map`: on real
    multi-chip TPU GSPMD cannot partition a Mosaic custom call ("Mosaic
    kernels cannot be automatically partitioned — wrap in shard_map"), so
    an unscoped trace compiles on the CPU sim (interpret-mode Pallas) but
    fails on hardware.  Shipped defaults hit this: fast_sin auto-picks the
    fused D-phase ray-tile kernel (train/step.py).  Regression test for the
    round-5 fix (loop.py entered the scope only when ray_shards > 1)."""
    from cips3d_tpu.parallel import mesh as mesh_lib

    calls = []
    orig = mesh_lib.pixel_shard_map

    def spy(fn, b, n, in_kinds, out_kinds):
        wrapped = orig(fn, b, n, in_kinds, out_kinds)
        calls.append({"scope": mesh_lib.pixel_scope_active(),
                      "wrapped": wrapped is not fn})
        return wrapped

    monkeypatch.setattr(mesh_lib, "pixel_shard_map", spy)

    gcfg = dataclasses.replace(GCFG, fast_sin=True)  # => fused D-phase
    tcfg = TrainConfig(
        img_size=8, batch_size=1, grad_points=None, total_iters=2,
        ema_start_itr=1,
    )
    opts = RenderOptions(img_size=8, num_steps=3)
    lcfg = LoopConfig(
        outdir=str(tmp_path / "run_1d_fused"), data_path=data_zip,
        log_every=1, eval_every=2, fixed_z_bs=2, num_workers=1, debug=True,
    )
    state = train(gcfg, tcfg, opts, lcfg,
                  disc_kwargs={"max_size": 16, "channels_override": TINY},
                  n_devices=2)
    assert int(state.step) == 2
    # the fused D-phase kernel was invoked under an ACTIVE scope and
    # actually shard_map-wrapped (not the identity fallback)
    assert calls, "fused kernel path never invoked — auto-pick regressed?"
    assert any(c["scope"] and c["wrapped"] for c in calls), calls


def test_monitor_failure_escalation(data_zip, tmp_path, monkeypatch):
    """Monitor failures are counted, logged to MONITOR_FAILURES.log, and
    escalate to a hard error after 3 consecutive evals (a silent one-line
    print hid an OOM for a whole campaign once)."""
    import cips3d_tpu.train.loop as loop_mod

    def boom(*a, **k):
        raise RuntimeError("synthetic monitor failure")

    monkeypatch.setattr(loop_mod, "save_monitor_images", boom)
    outdir = str(tmp_path / "run_monfail")
    tcfg = TrainConfig(
        img_size=8, batch_size=2, grad_points=None, total_iters=3, ema_start_itr=1
    )
    opts = RenderOptions(img_size=8, num_steps=3)
    lcfg = LoopConfig(
        outdir=outdir, data_path=data_zip, log_every=1, eval_every=1,
        num_images_real_eval=4, num_images_gen_eval=4, eval_batch_size=2,
        fixed_z_bs=2, num_workers=1, dispatch_chunk=1,
    )
    with pytest.raises(RuntimeError, match="3 evals in a row"):
        train(GCFG, tcfg, opts, lcfg,
              disc_kwargs={"max_size": 16, "channels_override": TINY},
              n_devices=1)
    marker = os.path.join(outdir, "ckptdir", "MONITOR_FAILURES.log")
    assert os.path.exists(marker)
    content = open(marker).read()
    assert "synthetic monitor failure" in content
    assert "consecutive #3" in content


def test_lazy_r1_schedule(tmp_path):
    """d_reg_every=2: R1 only on even steps (`train.py:387` lazy reg)."""
    from cips3d_tpu.data.zip_dataset import write_stylegan_zip

    data = str(tmp_path / "d.zip")
    rng = np.random.default_rng(0)
    write_stylegan_zip(data, [rng.integers(0, 255, (8, 8, 3), dtype=np.uint8) for _ in range(8)])
    outdir = str(tmp_path / "run")
    tcfg = TrainConfig(
        img_size=8, batch_size=1, grad_points=None, total_iters=2, ema_start_itr=1,
        d_reg_every=2,
    )
    opts = RenderOptions(img_size=8, num_steps=3)
    lcfg = LoopConfig(
        outdir=outdir, data_path=data, log_every=1, eval_every=2,
        fixed_z_bs=2, num_workers=1, debug=True,
    )
    train(GCFG, tcfg, opts, lcfg, disc_kwargs={"max_size": 16, "channels_override": TINY},
          n_devices=2)
    log = os.path.join(outdir, "textdir", "train.grad_penalty.grad_penalty.log")
    with open(log) as f:
        vals = [float(line.split()[1]) for line in f if line.strip()]
    assert len(vals) == 2
    assert vals[0] > 0          # step 0: R1 on
    assert vals[1] == 0         # step 1: lazy-skipped


def test_refuse_sealed_outdir(tmp_path):
    """train() must hard-error instead of writing into a sealed campaign
    tree (verdict r3 next #7 — the sin-A/B overwrite incident)."""
    from cips3d_tpu.train.loop import _refuse_sealed_outdir

    root = tmp_path / "campaign"
    stage = root / "exact" / "train_r64"
    stage.mkdir(parents=True)
    # unsealed: fine
    _refuse_sealed_outdir(str(stage))
    (root / "CAMPAIGN_SEALED").write_text("sealed 2026-08-18")
    # the outdir itself, a stage below the sealed root, and a not-yet-created
    # subdir are all refused
    with pytest.raises(RuntimeError, match="sealed campaign"):
        _refuse_sealed_outdir(str(root))
    with pytest.raises(RuntimeError, match="sealed campaign"):
        _refuse_sealed_outdir(str(stage))
    with pytest.raises(RuntimeError, match="sealed campaign"):
        _refuse_sealed_outdir(str(root / "new_stage"))
    # sibling trees are unaffected
    _refuse_sealed_outdir(str(tmp_path / "other"))

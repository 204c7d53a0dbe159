"""End-to-end host-loop smoke tests for the two variant training drivers:
diffcam (3 optimizers + camera in every checkpoint tree,
exp/cips3d_inversion/scripts/train.py:300-520) and the pi-GAN baseline
(piGAN_lib/train.py, exp/dev/nerf_inr/scripts/train_v16.py:384).

Same bar as tests/test_loop.py for the flagship: synthetic zip → 2 debug
steps → surrogate-FID eval → checkpoint trees → exact resume.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from cips3d_tpu.data.zip_dataset import write_stylegan_zip
from cips3d_tpu.models.camera import CamParams
from cips3d_tpu.models.discriminator import DiscriminatorMultiScaleAux
from cips3d_tpu.models.generator import GeneratorConfig, RenderOptions
from cips3d_tpu.models.generator_diffcam import GeneratorDiffcam, NerfKwargs
from cips3d_tpu.models.pigan import ImplicitGenerator3d, ProgressiveDiscriminator
from cips3d_tpu.train.diffcam_step import DiffcamTrainConfig
from cips3d_tpu.train.loop import LoopConfig
from cips3d_tpu.train.pigan_step import PiGANTrainConfig
from cips3d_tpu.train.variant_loop import (
    DiffcamPipeline,
    PiGANPipeline,
    run_variant_loop,
)

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


def make_diffcam_pipeline(img_size=8):
    cfg = DiffcamTrainConfig(
        img_size=img_size, batch_size=1, grad_points=None, total_iters=2,
        ema_start_itr=1,
    )
    return DiffcamPipeline(
        generator=GeneratorDiffcam(cfg=GCFG),
        discriminator=DiscriminatorMultiScaleAux(max_size=16, channels_override=TINY),
        camera=CamParams(H0=img_size, W0=img_size),
        train_cfg=cfg,
        nerf_kwargs=NerfKwargs(n_samples=3, n_importance=3),
    )


def make_pigan_pipeline(img_size=8):
    cfg = PiGANTrainConfig(
        img_size=img_size, batch_size=1, r1_lambda=0.2, pos_lambda=15.0,
        train_aux_img=False, total_iters=2, ema_start_itr=1,
    )
    return PiGANPipeline(
        generator=ImplicitGenerator3d(z_dim=16, hidden_dim=16),
        discriminator=ProgressiveDiscriminator(predict_encodings=True),
        train_cfg=cfg,
        opts=RenderOptions(img_size=img_size, num_steps=3),
    )


def loop_cfg(outdir, data_zip):
    return LoopConfig(
        outdir=outdir, data_path=data_zip, log_every=1, eval_every=2,
        fixed_z_bs=2, num_workers=1, debug=True,
    )


class TestDiffcamLoop:
    def test_debug_run_and_resume(self, data_zip, tmp_path):
        outdir = str(tmp_path / "run")
        pipe = make_diffcam_pipeline()
        first = run_variant_loop(pipe, loop_cfg(outdir, data_zip), n_devices=2)
        assert int(first.step) == 2
        # checkpoint trees carry the camera module AND all three optimizers
        # (`scripts/train.py:327-346`)
        resume_dir = os.path.join(outdir, "ckptdir", "resume")
        for f in ("cam_param.npz", "generator.npz", "G_ema.npz",
                  "discriminator.npz", "g_opt.npz", "d_opt.npz", "cam_opt.npz"):
            assert os.path.exists(os.path.join(resume_dir, f)), f
        best_dir = os.path.join(outdir, "ckptdir", "best_fid")
        assert os.path.exists(os.path.join(best_dir, "cam_param.npz"))
        logs = os.listdir(os.path.join(outdir, "textdir"))
        assert any("cam_total_norm" in f for f in logs)
        assert any("FID" in f for f in logs)
        assert len(os.listdir(os.path.join(outdir, "fid", "fake"))) > 0
        # monitors rendered
        assert os.path.exists(os.path.join(resume_dir, "0Gz_ema.jpg"))

        # exact resume: same step, optimizer states restored bit-for-bit
        pipe2 = make_diffcam_pipeline()
        state = run_variant_loop(
            pipe2, loop_cfg(outdir, data_zip), resume=True, n_devices=2)
        assert int(state.step) >= 2
        for a, b in zip(
            jax.tree_util.tree_leaves(first.cam_opt),
            jax.tree_util.tree_leaves(state.cam_opt),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        # camera params restored too
        for a, b in zip(
            jax.tree_util.tree_leaves(first.cam_params),
            jax.tree_util.tree_leaves(state.cam_params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


class TestPiGANLoop:
    def test_debug_run_and_resume(self, data_zip, tmp_path):
        outdir = str(tmp_path / "run")
        pipe = make_pigan_pipeline()
        first = run_variant_loop(pipe, loop_cfg(outdir, data_zip), n_devices=2)
        assert int(first.step) == 2
        resume_dir = os.path.join(outdir, "ckptdir", "resume")
        for f in ("generator.npz", "G_ema.npz", "discriminator.npz",
                  "g_opt.npz", "d_opt.npz"):
            assert os.path.exists(os.path.join(resume_dir, f)), f
        logs = os.listdir(os.path.join(outdir, "textdir"))
        assert any("identity_penalty" in f for f in logs)
        assert any("FID" in f for f in logs)
        assert len(os.listdir(os.path.join(outdir, "fid", "fake"))) > 0
        assert os.path.exists(os.path.join(resume_dir, "0Gz_tilted_ema.jpg"))

        pipe2 = make_pigan_pipeline()
        state = run_variant_loop(
            pipe2, loop_cfg(outdir, data_zip), resume=True, n_devices=2)
        assert int(state.step) >= 2
        for a, b in zip(
            jax.tree_util.tree_leaves(first.g_opt),
            jax.tree_util.tree_leaves(state.g_opt),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


class TestVariantCLI:
    def test_diffcam_cli_debug(self, data_zip, tmp_path, monkeypatch):
        """`python -m cips3d_tpu.train.cli --config configs/diffcam.yaml`
        trains end-to-end (VERDICT r4 next #2 done-criterion)."""
        from cips3d_tpu.train import cli

        monkeypatch.chdir(tmp_path)
        rc = cli.main([
            "--config", os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "diffcam.yaml"),
            "--command", "train_r32", "--debug", "--opts",
            "data_path", data_zip,
            "outdir", str(tmp_path / "dc"),
            "img_size", "8", "batch_size", "1",
            "num_workers", "1", "eval_batch_size", "4", "fixed_z_bs", "2",
            "generator.z_dim_nerf", "16", "generator.z_dim_inr", "32",
            "generator.nerf_hidden_dim", "16", "generator.nerf_style_dim", "16",
            "generator.nerf_mapping_layers", "2", "generator.inr_hidden_dim", "32",
            "generator.inr_style_dim", "32", "generator.inr_mapping_layers", "2",
            "generator.fast_sin", "false",
            "nerf_kwargs.n_samples", "3", "nerf_kwargs.n_importance", "3",
            "discriminator.max_size", "16",
            "discriminator.channels_override.4", "16",
            "discriminator.channels_override.8", "16",
            "discriminator.channels_override.16", "16",
        ])
        assert rc == 0
        assert os.path.isdir(str(tmp_path / "dc" / "train_r32" / "ckptdir" / "resume"))

    def test_pigan_cli_debug(self, data_zip, tmp_path, monkeypatch):
        from cips3d_tpu.train import cli

        monkeypatch.chdir(tmp_path)
        rc = cli.main([
            "--config", os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "pigan.yaml"),
            "--command", "train_r32", "--debug", "--opts",
            "data_path", data_zip,
            "outdir", str(tmp_path / "pg"),
            "img_size", "8", "batch_size", "1",
            "num_workers", "1", "eval_batch_size", "4", "fixed_z_bs", "2",
            "render.num_steps", "3",
            "generator.z_dim", "16", "generator.hidden_dim", "16",
        ])
        assert rc == 0
        assert os.path.isdir(str(tmp_path / "pg" / "train_r32" / "ckptdir" / "resume"))

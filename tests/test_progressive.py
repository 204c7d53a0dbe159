"""Progressive stage-chain smoke test (reference recipe chain:
exp/cips3d/bash/ffhq_exp/train_ffhq_r{32,64}.sh via finetune_dir)."""

import os

import numpy as np
import pytest

from cips3d_tpu.models.generator import GeneratorConfig, RenderOptions
from cips3d_tpu.train.curriculum import FFHQ_STAGES, Stage, run_progressive
from cips3d_tpu.train.loop import LoopConfig
from cips3d_tpu.train.state import TrainConfig

TINY = {r: 16 for r in (4, 8, 16, 32, 64, 128, 256, 512, 1024)}
GCFG = GeneratorConfig(
    z_dim_nerf=16, z_dim_inr=32, nerf_hidden_dim=16, nerf_style_dim=16,
    nerf_mapping_layers=2, inr_hidden_dim=32, inr_style_dim=32, inr_mapping_layers=2,
)


def test_ffhq_stage_table():
    assert [s.img_size for s in FFHQ_STAGES] == [32, 64, 128, 256]
    assert FFHQ_STAGES[-1].gen_overrides["freeze_nerf"] is True
    assert FFHQ_STAGES[-1].load_nerf_ema is True


def test_two_stage_chain(tmp_path):
    from cips3d_tpu.data.zip_dataset import write_stylegan_zip

    data = str(tmp_path / "d.zip")
    rng = np.random.default_rng(0)
    write_stylegan_zip(data, [rng.integers(0, 255, (8, 8, 3), dtype=np.uint8) for _ in range(8)])

    stages = [
        Stage("s8a", 8, 2),
        Stage("s8b", 8, 2),
    ]
    tcfg = TrainConfig(img_size=8, batch_size=1, grad_points=None, total_iters=2, ema_start_itr=1)
    opts = RenderOptions(img_size=8, num_steps=3)
    lcfg = LoopConfig(
        outdir=str(tmp_path / "prog"), data_path=data, log_every=1, eval_every=2,
        fixed_z_bs=2, num_workers=1, debug=True,
    )
    state = run_progressive(
        GCFG, tcfg, opts, lcfg, stages=stages,
        disc_kwargs={"max_size": 16, "channels_override": TINY},
    )
    assert int(state.step) == 2
    # both stage dirs exist and stage 2 loaded stage 1's best checkpoint
    assert os.path.isdir(str(tmp_path / "prog/s8a/ckptdir/best_fid"))
    assert os.path.isdir(str(tmp_path / "prog/s8b/ckptdir/resume"))

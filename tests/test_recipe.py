"""The shipped FFHQ recipe must actually chain stages.

Round-1 verdict found two bugs in `configs/ffhq.yaml`: stages set
``finetune_dir`` without ``load_finetune: true`` (so the CLI never loaded it,
`train/cli.py`), and the dirs pointed at paths no stage ever writes.  These
tests resolve the REAL yaml end-to-end: run `train_r32` through the CLI
(tiny dims via --opts, --debug), then `train_r64`, asserting the r64 stage
passes the r32 best_fid snapshot into ``train()`` and that loading succeeds
(a wrong path raises FileNotFoundError inside the checkpoint manager).

Reference recipe chain: `exp/cips3d/bash/ffhq_exp/train_ffhq_r64.sh:66-70`,
`exp/cips3d/configs/ffhq_exp.yaml:192-210`.
"""

import os

import numpy as np
import pytest

from cips3d_tpu.config.config import resolve_command
from cips3d_tpu.train import cli

YAML = os.path.join(os.path.dirname(__file__), "..", "configs", "ffhq.yaml")

TINY_OPTS = [
    "batch_size", "1",
    "fixed_z_bs", "2",
    "eval_batch_size", "4",
    "num_workers", "1",
    "grad_points", "null",
    "forward_points", "null",
    "img_size", "8",
    "render.num_steps", "3",
    "generator.z_dim_nerf", "16",
    "generator.z_dim_inr", "32",
    "generator.nerf_hidden_dim", "16",
    "generator.nerf_style_dim", "16",
    "generator.nerf_mapping_layers", "2",
    "generator.inr_hidden_dim", "32",
    "generator.inr_style_dim", "32",
    "generator.inr_mapping_layers", "2",
    "discriminator.max_size", "16",
    "discriminator.channels_override.4", "16",
    "discriminator.channels_override.8", "16",
    "discriminator.channels_override.16", "16",
]


def test_stage_chain_config_consistency():
    """Every stage's finetune_dir points at the previous stage's best_fid
    under the outdir the CLI actually writes (`<outdir>/<command>`)."""
    prev = "train_r32"
    for cmd in ("train_r64", "train_r128", "train_r256"):
        cfg = resolve_command(YAML, cmd)
        assert cfg.get("load_finetune") is True, f"{cmd} must set load_finetune"
        expected = f"{cfg['outdir']}/{prev}/ckptdir/best_fid"
        assert cfg["finetune_dir"] == expected, (cmd, cfg["finetune_dir"], expected)
        kwargs = cli.train_kwargs_from_config(cfg)
        assert kwargs["finetune_dir"] == expected
        prev = cmd
    # r32 starts from scratch
    assert cli.train_kwargs_from_config(resolve_command(YAML, "train_r32"))[
        "finetune_dir"
    ] is None


def test_synthetic_progressive_chain_consistency():
    """The progressive validation recipe chains its stages the same way and
    its r256 node reproduces the train_ffhq_high overrides
    (`exp/cips3d/configs/ffhq_exp.yaml:192-210`) with merge (not replace)
    semantics for the nested generator/discriminator nodes."""
    yaml = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "synthetic_progressive.yaml")
    prev = "train_r32"
    for cmd in ("train_r64", "train_r128", "train_r256"):
        cfg = resolve_command(yaml, cmd)
        assert cfg.get("load_finetune") is True
        assert cfg["finetune_dir"] == f"{cfg['outdir']}/{prev}/ckptdir/best_fid"
        assert cfg["data_path"].endswith(f"blobs_{cfg['img_size']}.zip")
        prev = cmd
    hi = resolve_command(yaml, "train_r256")
    g = hi.generator.to_dict()
    assert g["freeze_nerf"] is True
    assert g["inr_hidden_dim"] == 512  # anchor fields survive the override
    assert hi.discriminator.to_dict()["diffaug"] is True
    assert hi.get("warmup_d") is True and hi.get("load_nerf_ema") is True
    assert hi.get("train_aux_img") is False and hi.get("nerf_noise_disable") is True


@pytest.mark.slow
def test_recipe_two_stages_end_to_end(tmp_path, monkeypatch):
    from cips3d_tpu.data.zip_dataset import write_stylegan_zip

    monkeypatch.chdir(tmp_path)
    data = str(tmp_path / "d.zip")
    rng = np.random.default_rng(0)
    write_stylegan_zip(
        data, [rng.integers(0, 255, (8, 8, 3), dtype=np.uint8) for _ in range(8)]
    )
    opts = TINY_OPTS + ["data_path", data]

    cli.main(["--config", YAML, "--command", "train_r32", "--debug", "--opts", *opts])
    best = tmp_path / "results/ffhq/train_r32/ckptdir/best_fid"
    assert best.is_dir() and (best / "generator.npz").exists()

    # spy on the finetune_dir the CLI hands to train(); the real train() then
    # loads it (a stale path would raise FileNotFoundError)
    seen = {}
    real_train = cli.train

    def spy(*args, **kwargs):
        seen.update(kwargs)
        return real_train(*args, **kwargs)

    monkeypatch.setattr(cli, "train", spy)
    cli.main(["--config", YAML, "--command", "train_r64", "--debug", "--opts", *opts])
    assert seen["finetune_dir"] == "results/ffhq/train_r32/ckptdir/best_fid"
    assert (tmp_path / "results/ffhq/train_r64/ckptdir/resume").is_dir()


FINETUNE_YAML = os.path.join(
    os.path.dirname(__file__), "..", "configs", "finetune.yaml"
)


def test_finetune_recipe_consistency():
    """The dataset-transfer recipes (`exp/cips3d/configs/finetune_afhq.yaml`,
    `finetuning_exp.yaml`) start from the FFHQ r256 snapshot with the
    reference's finetune semantics: freeze-NeRF, diffaug, aux off, NO D
    warmup (the pretrained D starts at full alpha — unlike train_r256),
    NeRF noise off, lr 1e-4/5e-4."""
    for cmd in ("finetune_afhq", "finetune_afhq_cat", "finetune_photo2cartoon"):
        cfg = resolve_command(FINETUNE_YAML, cmd)
        g = cfg.generator.to_dict()
        assert g["freeze_nerf"] is True, cmd
        assert cfg.get("load_finetune") is True and cfg.get("load_nerf_ema") is True
        assert cfg["finetune_dir"] == "results/ffhq/train_r256/ckptdir/best_fid"
        assert cfg.get("warmup_d") is False          # finetune_afhq.yaml:97
        assert cfg.get("diffaug") is True and cfg.get("train_aux_img") is False
        assert cfg.get("nerf_noise_disable") is True
        assert cfg.get("gen_lr") == 1e-4 and cfg.get("disc_lr") == 5e-4
        assert cfg["img_size"] == 256 and cfg.get("d_reg_every") == 1
        kwargs = cli.train_kwargs_from_config(cfg)
        assert kwargs["finetune_dir"] == cfg["finetune_dir"]
        assert kwargs["load_nerf_ema"] is True


@pytest.mark.slow
def test_finetune_end_to_end(tmp_path, monkeypatch):
    """Finetune from a (tiny) pretrained snapshot: pretrain via the FFHQ r32
    debug stage, then run finetune_afhq on a different dataset pointing
    finetune_dir at that snapshot — the loop must load it and train."""
    from cips3d_tpu.data.zip_dataset import write_stylegan_zip

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    ffhq = str(tmp_path / "ffhq.zip")
    afhq = str(tmp_path / "afhq.zip")
    for path, seed in ((ffhq, 0), (afhq, 1)):
        r = np.random.default_rng(seed)
        write_stylegan_zip(
            path, [r.integers(0, 255, (8, 8, 3), dtype=np.uint8) for _ in range(8)]
        )

    cli.main(["--config", YAML, "--command", "train_r32", "--debug",
              "--opts", *TINY_OPTS, "data_path", ffhq])
    best = tmp_path / "results/ffhq/train_r32/ckptdir/best_fid"
    assert best.is_dir()

    cli.main([
        "--config", FINETUNE_YAML, "--command", "finetune_afhq", "--debug",
        "--opts", *TINY_OPTS, "data_path", afhq,
        "finetune_dir", str(best),
    ])
    out = tmp_path / "results/finetune/finetune_afhq"
    assert (out / "ckptdir/resume").is_dir()
    # the finetuned generator keeps freeze-NeRF semantics end-to-end
    cfg = resolve_command(FINETUNE_YAML, "finetune_afhq")
    assert cfg.generator.to_dict()["freeze_nerf"] is True

"""Training CLI: resolve a YAML command node and run the loop.

Replaces the reference's unittest-launcher + bash-recipe entry chain
(`exp/tests/test_cips3d.py:844-946` → `exp/cips3d/scripts/train.py:581-609`)
with a single command:

    python -m cips3d_tpu.train.cli --config configs/ffhq.yaml \
        --command train_r32 [--opts key value ...] [--debug]

``--debug`` shrinks the run to a 2-step smoke test (the `tl_debug` analogue,
`exp/tests/test_cips3d.py:917-921`).
"""

from __future__ import annotations

import sys

from cips3d_tpu.config.config import dump_config, parse_args, resolve_command
from cips3d_tpu.models.generator import GeneratorConfig, RenderOptions
from cips3d_tpu.train.loop import LoopConfig, train
from cips3d_tpu.train.state import TrainConfig


def config_to_dataclasses(cfg):
    """Split a resolved config node into the typed configs."""
    g = cfg.generator.to_dict()
    gen_cfg = GeneratorConfig(**g)

    r = cfg.render.to_dict()
    hierarchical = r.pop("hierarchical_sample", True)
    opts = RenderOptions(
        img_size=cfg.img_size, hierarchical_sample=hierarchical, **r
    )

    tc_fields = {f for f in TrainConfig.__dataclass_fields__}
    tc = {k: v for k, v in cfg.to_dict().items() if k in tc_fields}
    train_cfg = TrainConfig(**tc)

    lc_fields = {f for f in LoopConfig.__dataclass_fields__}
    lc = {k: v for k, v in cfg.to_dict().items() if k in lc_fields}
    loop_cfg = LoopConfig(**lc)
    return gen_cfg, train_cfg, opts, loop_cfg


def train_kwargs_from_config(cfg) -> dict:
    """Resume/finetune gating (`train.py:258-285`): ``finetune_dir`` only
    takes effect when ``load_finetune`` is set, matching the reference's
    `load_finetune + finetune_dir` pairing (`train_ffhq_r64.sh:66-70`)."""
    return dict(
        resume=bool(cfg.get("resume", False)),
        finetune_dir=cfg.get("finetune_dir") if cfg.get("load_finetune", False) else None,
        load_nerf_ema=bool(cfg.get("load_nerf_ema", False)),
        reset_best_fid=bool(cfg.get("reset_best_fid", False)),
    )


def main(argv=None):
    from cips3d_tpu.parallel.mesh import initialize_multihost
    from cips3d_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    initialize_multihost()  # no-op unless CIPS3D_COORDINATOR/… are set
    args = parse_args(argv)
    cfg = resolve_command(args.config, args.command, args.opts)

    # variant pipelines (`pipeline: diffcam|pigan` in the command node) run
    # through the shared variant driver; default is the flagship loop
    pipeline_name = cfg.get("pipeline", "cips3d")
    if pipeline_name in ("diffcam", "pigan"):
        from cips3d_tpu.train import variant_loop

        lc_fields = {f for f in LoopConfig.__dataclass_fields__}
        loop_cfg = LoopConfig(
            **{k: v for k, v in cfg.to_dict().items() if k in lc_fields})
        if args.debug:
            loop_cfg.debug = True
        loop_cfg.outdir = cfg.get("outdir", args.outdir) + f"/{args.command}"
        print(f"resolved config:\n{dump_config(cfg)}", flush=True)
        build = (variant_loop.build_diffcam_pipeline if pipeline_name == "diffcam"
                 else variant_loop.build_pigan_pipeline)
        kw = train_kwargs_from_config(cfg)
        kw.pop("load_nerf_ema", None)  # flagship-only (freeze-NeRF chaining)
        variant_loop.run_variant_loop(build(cfg), loop_cfg, **kw)
        return 0
    if pipeline_name != "cips3d":
        raise SystemExit(f"unknown pipeline {pipeline_name!r}")

    gen_cfg, train_cfg, opts, loop_cfg = config_to_dataclasses(cfg)
    if args.debug:
        loop_cfg.debug = True
    loop_cfg.outdir = cfg.get("outdir", args.outdir) + f"/{args.command}"

    print(f"resolved config:\n{dump_config(cfg)}", flush=True)
    train(
        gen_cfg,
        train_cfg,
        opts,
        loop_cfg,
        disc_kwargs=cfg.discriminator.to_dict(),
        **train_kwargs_from_config(cfg),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

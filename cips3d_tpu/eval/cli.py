"""Standalone evaluation CLI.

Counterparts of the reference's eval launchers:
  * `eval_fid`  (`exp/cips3d/scripts/eval_fid.py:71-123`): dump 50k reals +
    50k EMA fakes, compute FID (+KID);
  * `gen_images` (`exp/cips3d/scripts/gen_images.py`), `sample_images`
    (`exp/cips3d/scripts/sample_images.py`): image dumps from a checkpoint;
  * multiview / trajectory rendering and model interpolation
    (`exp/pigan/scripts/render_multiview_images.py`, `scripts/web_demo.py`).

Usage:
  python -m cips3d_tpu.eval.cli fid --ckpt results/run/ckptdir/best_fid \
      --data datasets/ffhq_256.zip --img-size 256 --num-images 50000
  python -m cips3d_tpu.eval.cli gen --ckpt ... --out fakes/ --num-images 100
  python -m cips3d_tpu.eval.cli sample --ckpt ... --out samples/
  python -m cips3d_tpu.eval.cli multiview --ckpt ... --out grid.png
  python -m cips3d_tpu.eval.cli trajectory --ckpt ... --out video_dir/ --mode circle
  python -m cips3d_tpu.eval.cli viewer --ckpt ... --out viewer.html
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR, RenderOptions, sample_zs
from cips3d_tpu.utils.checkpoint import CheckpointManager


def load_generator(ckpt_dir: str, gen_cfg: GeneratorConfig, module: str = "G_ema"):
    """Load (model, params) from a snapshot directory."""
    gen = GeneratorNerfINR(cfg=gen_cfg)
    key = jax.random.PRNGKey(0)
    zs = sample_zs(key, 1, gen_cfg)
    ref = gen.init(key, zs, key, RenderOptions(img_size=8, num_steps=3))
    mgr = CheckpointManager(os.path.dirname(ckpt_dir))
    loaded = mgr.load_snapshot(os.path.basename(ckpt_dir), {module: ref})
    return gen, loaded[module]


def main(argv=None):
    from cips3d_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["fid", "gen", "sample", "multiview", "trajectory", "viewer"])
    p.add_argument("--ckpt", required=True, help="snapshot dir (e.g. .../ckptdir/best_fid)")
    p.add_argument("--module", default="G_ema")
    p.add_argument("--config", default=None, help="YAML with a `generator:` node "
                   "(to eval checkpoints of non-default architecture)")
    p.add_argument("--command", default=None, help="command node in --config")
    p.add_argument("--data", default=None, help="dataset zip (fid mode)")
    p.add_argument("--out", default="eval_out")
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--num-steps", type=int, default=12)
    p.add_argument("--num-images", type=int, default=2048)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--kid", action="store_true")
    p.add_argument(
        "--allow-surrogate",
        action="store_true",
        help="permit the random-projection FID_surrogate when InceptionV3 "
        "weights are unavailable (relative tracking only)",
    )
    p.add_argument("--psi", type=float, default=0.7)
    p.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2, 3])
    p.add_argument("--trajectory-mode", default="circle")
    p.add_argument("--num-frames", type=int, default=30)
    p.add_argument("--depth", action="store_true",
                   help="also render depth maps (trajectory video / viewer toggle)")
    p.add_argument("--serving", action="store_true",
                   help="render through the serving configuration: fused "
                   "ray-tile + INR Pallas kernels with fast_sin (forward "
                   "parity-tested; ~1.5x the XLA path at r256)")
    args = p.parse_args(argv)

    gen_cfg = GeneratorConfig()
    if args.config:
        from cips3d_tpu.config.config import resolve_command

        cfg = resolve_command(args.config, args.command or "train_base")
        gen_cfg = GeneratorConfig(**cfg.generator.to_dict())
    if args.serving:
        import dataclasses

        gen_cfg = dataclasses.replace(
            gen_cfg, fused_ray=True, fused_inr=True, fast_sin=True
        )
    gen, params = load_generator(args.ckpt, gen_cfg, args.module)

    if args.mode == "fid":
        from cips3d_tpu.data.zip_dataset import ZipImageDataset
        from cips3d_tpu.eval.fid import eval_fid
        from cips3d_tpu.eval.images import gen_images, setup_evaluation

        real_dir = os.path.join(args.out, "fid/real")
        fake_dir = os.path.join(args.out, "fid/fake")
        setup_evaluation(ZipImageDataset(args.data), real_dir, args.num_images, args.img_size)
        gen_images(params, gen, fake_dir, args.num_images, args.img_size,
                   batch_size=args.batch_size, num_steps=args.num_steps)
        metrics = eval_fid(
            real_dir, fake_dir, kid=args.kid, require_reference=not args.allow_surrogate
        )
        print(metrics)
    elif args.mode == "gen":
        from cips3d_tpu.eval.images import gen_images

        n = gen_images(params, gen, args.out, args.num_images, args.img_size,
                       batch_size=args.batch_size, num_steps=args.num_steps)
        print(f"wrote {n} images to {args.out}")
    elif args.mode == "sample":
        from cips3d_tpu.eval.images import sample_images

        n = sample_images(params, gen, args.out, args.num_images, args.img_size,
                          batch_size=args.batch_size, num_steps=args.num_steps)
        print(f"wrote {n} images to {args.out}")
    elif args.mode == "multiview":
        from cips3d_tpu.apps.render import render_multiview

        render_multiview(params, gen, args.out, seeds=args.seeds,
                         img_size=args.img_size, num_steps=args.num_steps, psi=args.psi)
        print(f"wrote {args.out}")
    elif args.mode == "trajectory":
        from cips3d_tpu.apps.render import render_trajectory_video

        frames = render_trajectory_video(
            params, gen, args.out, seed=args.seeds[0], mode=args.trajectory_mode,
            num_frames=args.num_frames, img_size=args.img_size, num_steps=args.num_steps,
            psi=args.psi, depth=args.depth,
        )
        print(f"wrote {len(frames)} frames to {args.out}")
    elif args.mode == "viewer":
        from cips3d_tpu.apps.viewer import export_html_viewer

        out = args.out if args.out.endswith(".html") else os.path.join(args.out, "viewer.html")
        export_html_viewer(
            params, gen, out, seeds=args.seeds,
            img_size=args.img_size, num_steps=args.num_steps, psi=args.psi,
            depth=args.depth,
        )
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Collect progressive-campaign evidence into a docs directory: per-metric
curves (one panel per metric, one curve per stage) plus each stage's final
monitor grids (EMA fixed-z, tilted camera, mirror probe).

Usage:
    python tools/collect_campaign.py results/synth_prog docs/campaign_progressive \
        --stages train_r32 train_r64 train_r128 train_r256
"""

import argparse
import os
import shutil


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", help="campaign outdir (contains one dir per stage)")
    p.add_argument("out", help="docs destination")
    p.add_argument("--stages", nargs="+",
                   default=["train_r32", "train_r64", "train_r128", "train_r256"])
    p.add_argument("--metrics", nargs="+",
                   default=["eval.FID_surrogate.FID_surrogate",
                            "train.d_loss.d_loss",
                            "train.g_loss.g_loss",
                            "train.grad_penalty.grad_penalty",
                            "train.alpha.alpha",
                            "train.d_logits_real.d_logits_real",
                            "train.d_logits_fake.d_logits_fake"])
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cips3d_tpu.utils.textlogger import read_log

    os.makedirs(args.out, exist_ok=True)

    for metric in args.metrics:
        fig, ax = plt.subplots(figsize=(8, 4.5))
        found = 0
        for stage in args.stages:
            path = os.path.join(args.root, stage, "textdir", metric + ".log")
            if not os.path.exists(path):
                continue
            steps, values = read_log(path)
            if steps:
                ax.plot(steps, values, label=stage)
                found += 1
        if not found:
            plt.close(fig)
            continue
        short = metric.split(".")[-1]
        ax.set_xlabel("stage step")
        ax.set_title(short)
        ax.legend()
        fig.savefig(os.path.join(args.out, f"{short}.png"), dpi=120,
                    bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {short}.png ({found} stages)")

    for stage in args.stages:
        mondir = os.path.join(args.root, stage, "ckptdir", "resume")
        for name in ("0Gz_ema.jpg", "0Gz_tilted_ema.jpg", "0G_flip_ema.jpg"):
            src = os.path.join(mondir, name)
            if os.path.exists(src):
                dst = os.path.join(args.out, f"{stage}_{name}")
                shutil.copyfile(src, dst)
                print(f"copied {dst}")


if __name__ == "__main__":
    main()

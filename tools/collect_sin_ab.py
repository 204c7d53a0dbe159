"""Score a completed sin A/B campaign (exact vs fast_sin legs) and archive
the evidence into docs/.

Given a campaign root containing `exact/<stage>/textdir` and
`fast/<stage>/textdir` (the layout written by tools/run_sin_ab*.sh),
this emits into the docs destination:

  - `fid_exact.log`, `fid_fast.log`, `speed_exact.log`, `speed_fast.log`
    (raw textlogger curves, copied — results/ is gitignored so this is how
    curves survive into the repo),
  - `FID_surrogate_ab.png` (FID curves overlaid + pointwise diff panel),
  - `SUMMARY.json` (one machine-readable line of the decision inputs:
    median imgs/s per leg, best/final/last-5-eval-mean FID, pointwise
    diff stats over shared eval steps).

The printed JSON is the decision record: the round-2 A/B (docs/sin_ab/
REPORT.md) and the round-4 re-run after the fast_sin f32-internals fix
both read from this shape.

Usage:
    python tools/collect_sin_ab.py results/sin_ab_r4 docs/sin_ab_r4 \
        --stage train_r64
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _summary(steps, values, last_n=5):
    if not steps:
        return {}
    return {
        "best": min(values),
        "final": values[-1],
        "final_step": steps[-1],
        "last_%d_mean" % last_n: sum(values[-last_n:]) / len(values[-last_n:]),
        "n_evals": len(values),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", help="campaign dir containing exact/ and fast/")
    p.add_argument("out", help="docs destination dir")
    p.add_argument("--stage", default="train_r64")
    p.add_argument("--legs", nargs=2, default=["exact", "fast"])
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cips3d_tpu.utils.textlogger import read_log

    os.makedirs(args.out, exist_ok=True)

    fid, speed = {}, {}
    for leg in args.legs:
        tdir = os.path.join(args.root, leg, args.stage, "textdir")
        fid_src = os.path.join(tdir, "eval.FID_surrogate.FID_surrogate.log")
        spd_src = os.path.join(tdir, "train.speed.imgs_per_sec.log")
        if not os.path.exists(fid_src):
            raise SystemExit(f"missing {fid_src} — leg incomplete?")
        shutil.copyfile(fid_src, os.path.join(args.out, f"fid_{leg}.log"))
        if os.path.exists(spd_src):
            shutil.copyfile(spd_src, os.path.join(args.out, f"speed_{leg}.log"))
            s_steps, s_vals = read_log(spd_src)
        else:
            s_steps, s_vals = [], []
        fid[leg] = read_log(fid_src)
        speed[leg] = (s_steps, s_vals)

    a, b = args.legs
    shared = sorted(
        set(fid[a][0]) & set(fid[b][0])
    )
    fa = dict(zip(*fid[a]))
    fb = dict(zip(*fid[b]))
    diffs = [fb[s] - fa[s] for s in shared]

    def med(v):
        v = sorted(v)
        return v[len(v) // 2] if v else None

    out = {
        "legs": args.legs,
        "stage": args.stage,
        a: {
            "imgs_per_sec_median": med(speed[a][1]),
            "FID_surrogate": _summary(*fid[a]),
        },
        b: {
            "imgs_per_sec_median": med(speed[b][1]),
            "FID_surrogate": _summary(*fid[b]),
        },
        "pointwise_diff_%s_minus_%s" % (b, a): {
            "n_shared_evals": len(shared),
            "mean": sum(diffs) / len(diffs) if diffs else None,
            "max_abs": max(abs(d) for d in diffs) if diffs else None,
            "last_5": diffs[-5:],
        },
    }

    fig, (ax1, ax2) = plt.subplots(
        2, 1, figsize=(8, 7), sharex=True,
        gridspec_kw={"height_ratios": [2.2, 1]},
    )
    for leg in args.legs:
        ax1.plot(*fid[leg], marker="o", ms=3, label=leg)
    ax1.set_ylabel("FID_surrogate")
    ax1.legend()
    ax1.set_title(f"sin A/B — {args.stage} ({args.root})")
    ax2.axhline(0.0, color="k", lw=0.8)
    ax2.plot(shared, diffs, marker="o", ms=3, color="tab:red")
    ax2.set_ylabel(f"{b} − {a}")
    ax2.set_xlabel("step")
    fig.tight_layout()
    png = os.path.join(args.out, "FID_surrogate_ab.png")
    fig.savefig(png, dpi=110)

    with open(os.path.join(args.out, "SUMMARY.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

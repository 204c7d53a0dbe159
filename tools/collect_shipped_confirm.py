"""Score the shipped-defaults confirmation leg against the committed sin
A/B v2 curves and archive the evidence into docs/.

The sin A/B raw trees are gitignored (and gone); the curves that survive
are the collector copies in docs/sin_ab_r4/ (`fid_fast.log`,
`fid_exact.log` — textlogger `step: value` lines).  This tool reads the
NEW leg's textdir from the campaign root, overlays all three curves,
applies the pre-registered gate from tools/run_shipped_confirm.sh
(last-5-eval-mean FID_surrogate must beat the exact leg — the shipped
combination must retain the quality win that justified the fast_sin
flip), and writes:

  - docs/shipped_confirm/fid_shipped.log, speed_shipped.log (raw curves)
  - docs/shipped_confirm/FID_surrogate_confirm.png (overlay + diff panel)
  - docs/shipped_confirm/SUMMARY.json (gate verdict + decision inputs)

Usage:
    python tools/collect_shipped_confirm.py results/shipped_confirm_r5 \
        docs/shipped_confirm --stage train_r64
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
    p.add_argument("root", help="campaign dir containing shipped/")
    p.add_argument("out", help="docs destination dir")
    p.add_argument("--stage", default="train_r64")
    p.add_argument("--ab-dir", default="docs/sin_ab_r4",
                   help="committed sin A/B curve dir (fid_fast/exact.log)")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cips3d_tpu.utils.textlogger import read_log

    os.makedirs(args.out, exist_ok=True)

    tdir = os.path.join(args.root, "shipped", args.stage, "textdir")
    fid_src = os.path.join(tdir, "eval.FID_surrogate.FID_surrogate.log")
    spd_src = os.path.join(tdir, "train.speed.imgs_per_sec.log")
    if not os.path.exists(fid_src):
        raise SystemExit(f"missing {fid_src} — leg incomplete?")
    shutil.copyfile(fid_src, os.path.join(args.out, "fid_shipped.log"))
    curves = {"shipped": read_log(fid_src)}
    if os.path.exists(spd_src):
        shutil.copyfile(spd_src, os.path.join(args.out, "speed_shipped.log"))
        speed = read_log(spd_src)[1]
    else:
        speed = []

    for leg in ("fast", "exact"):
        src = os.path.join(args.ab_dir, f"fid_{leg}.log")
        if os.path.exists(src):
            curves[leg] = read_log(src)
    if "exact" not in curves:
        # the exact curve IS the pre-registered gate threshold — exiting 0
        # without it would report collector success with the gate silently
        # unapplied (gate_pass absent from SUMMARY.json)
        raise SystemExit(
            f"missing {os.path.join(args.ab_dir, 'fid_exact.log')} — cannot "
            "apply the pre-registered gate (wrong --ab-dir?)"
        )

    def med(v):
        v = sorted(v)
        return v[len(v) // 2] if v else None

    out = {
        "stage": args.stage,
        "gate": "last_5_mean(shipped) < last_5_mean(exact)  [pre-registered,"
                " tools/run_shipped_confirm.sh]",
        "shipped": {
            "imgs_per_sec_median": med(speed),
            "FID_surrogate": _summary(*curves["shipped"]),
        },
    }
    for leg in ("fast", "exact"):
        if leg in curves:
            out[f"sin_ab_{leg}"] = {"FID_surrogate": _summary(*curves[leg])}

    if "exact" in curves:
        s = out["shipped"]["FID_surrogate"]["last_5_mean"]
        e = out["sin_ab_exact"]["FID_surrogate"]["last_5_mean"]
        out["gate_pass"] = bool(s < e)
        out["gate_margin"] = e - s
    if "fast" in curves:
        shared = sorted(set(curves["shipped"][0]) & set(curves["fast"][0]))
        fs = dict(zip(*curves["shipped"]))
        ff = dict(zip(*curves["fast"]))
        diffs = [fs[st] - ff[st] for st in shared]
        out["pointwise_diff_shipped_minus_fast"] = {
            "n_shared_evals": len(shared),
            "mean": sum(diffs) / len(diffs) if diffs else None,
            "max_abs": max(abs(d) for d in diffs) if diffs else None,
            "last_5": diffs[-5:],
        }

    fig, (ax1, ax2) = plt.subplots(
        2, 1, figsize=(8, 7), sharex=True,
        gridspec_kw={"height_ratios": [2.2, 1]},
    )
    for leg, c in curves.items():
        ax1.plot(*c, marker="o", ms=3, label=leg)
    ax1.set_ylabel("FID_surrogate")
    ax1.legend()
    ax1.set_title(f"shipped-defaults confirmation — {args.stage}")
    ax2.axhline(0.0, color="k", lw=0.8)
    if "fast" in curves:
        ax2.plot(shared, diffs, marker="o", ms=3, color="tab:red")
    ax2.set_ylabel("shipped − fast")
    ax2.set_xlabel("step")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "FID_surrogate_confirm.png"), dpi=110)

    with open(os.path.join(args.out, "SUMMARY.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

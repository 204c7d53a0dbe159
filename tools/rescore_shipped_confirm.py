"""Gate-robustness check for the shipped-defaults confirmation campaign:
re-score the shipped leg's archived eval dumps under multiple surrogate-
extractor seeds and re-apply the pre-registered gate per seed.

The sin A/B raw trees are gone (results/ is not persisted between rounds),
but docs/sin_ab_r4/RESCORE_SEEDS.json carries the exact/fast legs' per-seed
curves from the round-5 rescore.  This tool scores ONLY the new shipped leg
(`tools/rescore_sin_ab.score_leg`) and gates each seed's last-5-eval mean
against the stored exact leg (the same gate tools/collect_shipped_confirm.py
applies under seed 0), reporting the shipped-vs-fast delta as context.

Reference protocol being proxied: `exp/cips3d/scripts/eval_fid.py:36-57`
(one canonical pretrained extractor; the seed sweep substitutes for
"canonical" in the zero-egress environment).

Usage:
    python tools/rescore_shipped_confirm.py results/shipped_confirm_r5 \
        docs/shipped_confirm --stage train_r64 --seeds 0 1 2 --last-n 5
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# CPU-only tool: never touch the TPU tunnel for 64x64 conv stats
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from rescore_sin_ab import score_leg  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", help="campaign dir containing shipped/")
    p.add_argument("out", help="docs destination dir")
    p.add_argument("--stage", default="train_r64")
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--last-n", type=int, default=5)
    p.add_argument("--ab-rescore", default="docs/sin_ab_r4/RESCORE_SEEDS.json",
                   help="stored per-seed exact/fast curves from the sin A/B")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    shipped = score_leg(
        os.path.join(args.root, "shipped", args.stage), args.seeds)
    with open(args.ab_rescore) as f:
        ab = json.load(f)

    def ab_last_n(leg, seed):
        curve = ab["curves"][leg]  # {step: {seed: fid}}
        steps = sorted(int(s) for s in curve)
        vals = [curve[str(s)][str(seed)] for s in steps[-args.last_n:]]
        return float(np.mean(vals))

    steps = sorted(shipped)
    per_seed = {}
    for seed in args.seeds:
        ship_mean = float(np.mean(
            [shipped[s][seed] for s in steps[-args.last_n:]]))
        exact_mean = ab_last_n("exact", seed)
        fast_mean = ab_last_n("fast", seed)
        per_seed[seed] = {
            "last_%d_mean" % args.last_n: {
                "shipped": ship_mean, "exact": exact_mean, "fast": fast_mean},
            "gate_pass": bool(ship_mean < exact_mean),
            "gate_margin": exact_mean - ship_mean,
            "shipped_minus_fast": ship_mean - fast_mean,
        }
    result = {
        "stage": args.stage,
        "seeds": args.seeds,
        "gate": "last_%d_mean(shipped) < last_%d_mean(exact), per extractor "
                "seed [pre-registered gate of tools/run_shipped_confirm.sh, "
                "re-applied per seed]" % (args.last_n, args.last_n),
        "n_evals": len(steps),
        "per_seed": per_seed,
        "gate_pass_all_seeds": all(v["gate_pass"] for v in per_seed.values()),
        "curves_shipped": {str(s): shipped[s] for s in steps},
    }
    path = os.path.join(args.out, "RESCORE_SEEDS.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(
        {k: v for k, v in result.items() if k != "curves_shipped"}, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

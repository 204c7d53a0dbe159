"""Metric-robustness check for the progressive-chain rebaseline: re-score
each stage's archived eval dumps under multiple extractor seeds and check
that the seed-0 curve SHAPE (the thing the rebaseline report's conclusions
ride on) is reproduced under other seeds — Spearman rank correlation of
each seed's FID_surrogate-vs-step curve against seed 0.

"final < first" is NOT the health criterion for fine-tune stages: at step 1
the model is already converged from the previous stage (and the alpha-fade
renders mostly-upsampled low-res output that a 64x64-resized surrogate can
score *better* than the final high-res output), so within-stage curves can
legitimately rise.  What must be robust is the ordering of evals.

Companion to tools/rescore_sin_ab.py; see docs/metric_robustness.md.

Usage:
    python tools/rescore_rebaseline.py results/quality_rebaseline \
        docs/metric_robustness_rebaseline.json --seeds 0 1 2
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", help="rebaseline results dir containing train_r*/")
    p.add_argument("out_json")
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    args = p.parse_args()

    import numpy as np

    from tools.rescore_sin_ab import score_leg

    def spearman(x, y):
        rx = np.argsort(np.argsort(x)).astype(np.float64)
        ry = np.argsort(np.argsort(y)).astype(np.float64)
        rx -= rx.mean()
        ry -= ry.mean()
        denom = np.sqrt((rx @ rx) * (ry @ ry))
        return float(rx @ ry / denom) if denom else 1.0

    stages = sorted(
        (d for d in os.listdir(args.root) if d.startswith("train_r")),
        key=lambda d: int(d[len("train_r"):]),
    )
    base = args.seeds[0]
    result = {"root": args.root, "seeds": args.seeds, "stages": {}}
    for stage in stages:
        scores = score_leg(os.path.join(args.root, stage), args.seeds)
        steps = sorted(scores)
        curves = {
            seed: np.array([scores[s][seed] for s in steps])
            for seed in args.seeds
        }
        per_seed = {
            seed: {
                "first": curves[seed][0],
                "final": curves[seed][-1],
                "best": float(curves[seed].min()),
                "spearman_vs_seed%d" % base: spearman(curves[base], curves[seed]),
            }
            for seed in args.seeds
        }
        rhos = [
            per_seed[s]["spearman_vs_seed%d" % base]
            for s in args.seeds
            if s != base
        ]
        result["stages"][stage] = {
            "n_evals": len(steps),
            "first_step": steps[0],
            "final_step": steps[-1],
            "per_seed": per_seed,
            "min_spearman": min(rhos) if rhos else 1.0,
            "curves": {str(seed): list(curves[seed]) for seed in args.seeds},
        }
    result["min_spearman_over_stages"] = min(
        s["min_spearman"] for s in result["stages"].values()
    )
    result["curve_shape_robust"] = result["min_spearman_over_stages"] >= 0.8
    with open(args.out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()

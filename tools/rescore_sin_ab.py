"""Metric-robustness check: re-score archived eval dumps under multiple
surrogate-extractor seeds and report whether the A/B decision is stable.

Every quality decision in this repo rides ONE random-init texture extractor
(`eval/fid.py surrogate_extractor(seed=0)`).  Before a decision as
load-bearing as flipping the flagship sine default, the verdict requires a
rank-stability check: re-score the archived `fid/fake_step*` dumps (written
by `archive_eval_images: true`) against `fid/real` under extra extractor
seeds and check that the winner is the same winner under every seed.

Reference protocol being proxied: `exp/cips3d/scripts/eval_fid.py:36-57`
(fixed pretrained InceptionV3 — a single canonical extractor; the seed sweep
here substitutes for "canonical" in the zero-egress environment).

Usage:
    python tools/rescore_sin_ab.py results/sin_ab_r4 docs/sin_ab_r4 \
        --stage train_r64 --seeds 0 1 2 --last-n 5
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


def score_leg(leg_dir, seeds, batch_size=128):
    """{step: {seed: fid}} for every archived fake_step* dump in leg_dir/fid."""
    from cips3d_tpu.eval.fid import (
        activation_statistics,
        extract_dir_features,
        frechet_distance,
        surrogate_extractor,
    )

    fid_dir = os.path.join(leg_dir, "fid")
    real_dir = os.path.join(fid_dir, "real")
    steps = sorted(
        int(d[len("fake_step"):])
        for d in os.listdir(fid_dir)
        if d.startswith("fake_step")
    )
    out = {}
    real_stats = {}
    for seed in seeds:
        ex = surrogate_extractor(seed=seed)
        real_stats[seed] = activation_statistics(
            extract_dir_features(real_dir, ex, batch_size)
        )
    for step in steps:
        fake_dir = os.path.join(fid_dir, f"fake_step{step:06d}")
        out[step] = {}
        for seed in seeds:
            ex = surrogate_extractor(seed=seed)
            fake = activation_statistics(
                extract_dir_features(fake_dir, ex, batch_size)
            )
            out[step][seed] = frechet_distance(*real_stats[seed], *fake)
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", help="campaign dir containing the leg dirs")
    p.add_argument("out", help="docs destination dir")
    p.add_argument("--stage", default="train_r64")
    p.add_argument("--legs", nargs=2, default=["exact", "fast"])
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--last-n", type=int, default=5)
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    scores = {
        leg: score_leg(os.path.join(args.root, leg, args.stage), args.seeds)
        for leg in args.legs
    }

    a, b = args.legs
    shared = sorted(set(scores[a]) & set(scores[b]))
    per_seed = {}
    for seed in args.seeds:
        rows = [(s, scores[a][s][seed], scores[b][s][seed]) for s in shared]
        last = rows[-args.last_n:]
        mean_a = float(np.mean([r[1] for r in last]))
        mean_b = float(np.mean([r[2] for r in last]))
        per_seed[seed] = {
            "last_%d_mean" % args.last_n: {a: mean_a, b: mean_b},
            "final": {a: rows[-1][1], b: rows[-1][2]},
            "%s_wins_last_%d" % (b, args.last_n): sum(
                1 for r in last if r[2] < r[1]
            ),
            "winner_last_%d_mean" % args.last_n: b if mean_b < mean_a else a,
        }
    winners = {v["winner_last_%d_mean" % args.last_n] for v in per_seed.values()}
    result = {
        "legs": args.legs,
        "stage": args.stage,
        "seeds": args.seeds,
        "n_shared_evals": len(shared),
        "per_seed": per_seed,
        "rank_stable": len(winners) == 1,
        "winner": winners.pop() if len(winners) == 1 else None,
        "curves": {
            leg: {str(s): scores[leg][s] for s in scores[leg]} for leg in args.legs
        },
    }
    path = os.path.join(args.out, "RESCORE_SEEDS.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "curves"}, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

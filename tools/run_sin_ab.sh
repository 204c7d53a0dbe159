#!/bin/bash
# Exact-sin vs fast_sin A/B at r64 (VERDICT r2 next-#7): two from-scratch
# 10k-step r64 runs on the synthetic blob dataset, identical seed/config
# except generator.fast_sin.  Curves land under results/sin_ab/{exact,fast};
# compare the eval.FID_surrogate logs (tools/collect_campaign.py plots them).
set -euo pipefail
cd "$(dirname "$0")/.."
RES=results/sin_ab
. tools/campaign_lib.sh

ITERS="${1:-10000}"

for mode in exact fast; do
  if [ "$mode" = exact ]; then flag=false; else flag=true; fi
  echo "=== sin A/B: $mode (fast_sin=$flag, ${ITERS} iters) ==="
  python -m cips3d_tpu.train.cli \
    --config configs/synthetic_progressive.yaml --command train_r64 --opts \
    generator.fast_sin "$flag" \
    outdir "results/sin_ab/$mode" \
    total_iters "$ITERS" \
    load_finetune false
done
# evidence is complete: seal so a stray relaunch cannot overwrite it
# (the round-3 provenance incident); train() refuses sealed outdirs
seal_results results/sin_ab
echo "=== sin A/B done ==="

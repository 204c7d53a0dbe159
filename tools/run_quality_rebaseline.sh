#!/bin/bash
# Quality-history re-baseline (round-3 verdict next #4): the round-3
# texture-sensitive FID_surrogate is incompatible in scale with every
# pre-round-3 campaign log, and the raw eval images those campaigns were
# scored on were lost with the gitignored results/ trees.  This re-runs the
# full progressive chain (configs/synthetic_progressive.yaml, r32->r256)
# under the CURRENT extractor with `archive_eval_images true`, so
#   1. docs/ gets one continuous quality history on the new scale, and
#   2. every eval's raw image dump survives under fid/fake_step*/ for
#      re-scoring when the metric changes again.
# Results land in results/quality_rebaseline (sealed at completion);
# curves/grids are collected into docs/quality_rebaseline.
#
# Usage: bash tools/run_quality_rebaseline.sh [stages...]   (default: all 4)
set -euo pipefail
cd "$(dirname "$0")/.."
RES=results/quality_rebaseline
. tools/campaign_lib.sh

if [ ! -f datasets/blobs_256.zip ]; then
  mkdir -p datasets
  python -m cips3d_tpu.data.synthetic "datasets/blobs_{size}.zip" \
    --num 4000 --sizes 32,64,128,256 --seed 1
fi

PREV=""
STAGES=("$@"); [ ${#STAGES[@]} -eq 0 ] && STAGES=(train_r32 train_r64 train_r128 train_r256)

for cmd in "${STAGES[@]}"; do
  echo "=== rebaseline stage $cmd ($(date)) ==="
  EXTRA=()
  if [ -n "$PREV" ]; then
    EXTRA=(finetune_dir "$RES/$PREV/ckptdir/best_fid")
  fi
  python -m cips3d_tpu.train.cli \
    --config configs/synthetic_progressive.yaml --command "$cmd" --opts \
    outdir "$RES" archive_eval_images true "${EXTRA[@]}"
  PREV="$cmd"
done

python tools/collect_campaign.py "$RES" docs/quality_rebaseline \
  --stages "${STAGES[@]}"
seal_results "$RES"
echo "=== quality rebaseline done ($(date)) ==="

#!/bin/bash
# Progressive-chain campaign on one TPU chip (configs/synthetic_progressive.yaml).
# Generates the blob dataset pyramid if missing, then runs the 4 chained
# stages; each stage finetunes from the previous stage's best_fid snapshot.
# Evidence (curves, monitor grids, postmortem inputs) lands under
# results/synth_prog/ — collected into docs/campaign_progressive afterwards.
set -euo pipefail
cd "$(dirname "$0")/.."
RES=results/synth_prog
. tools/campaign_lib.sh

if [ ! -f datasets/blobs_256.zip ]; then
  mkdir -p datasets
  python -m cips3d_tpu.data.synthetic "datasets/blobs_{size}.zip" \
    --num 4000 --sizes 32,64,128,256 --seed 1
fi

for cmd in train_r32 train_r64 train_r128 train_r256; do
  echo "=== stage $cmd ==="
  python -m cips3d_tpu.train.cli \
    --config configs/synthetic_progressive.yaml --command "$cmd" "$@"
done
# evidence is complete: seal so a stray relaunch cannot overwrite it
seal_results results/synth_prog
echo "=== campaign done ==="

#!/bin/bash
# Round-5 shipped-defaults PROGRESSIVE chain: the quality rebaseline
# (docs/quality_rebaseline, round 4) ran the r32->r64->r128 stages under the
# then-default exact sine and with the fused D-phase kernels off; the
# round-5 flips (fast_sin everywhere + auto fused D-phase ray-tile + fused
# D-phase INR decode) have only been end-to-end-confirmed at r64
# (results/shipped_confirm_r5).  This campaign re-runs the FULL chain —
# identical stages/steps/data/seed to the rebaseline — under today's
# shipped defaults with zero overrides, giving a directly comparable
# per-stage quality series.
#
# Comparison target (docs/quality_rebaseline/REPORT.md final FID_surrogate):
#   r32 0.098 / r64 0.278 / r128 0.208 / r256 0.103
# Expectation (pre-registered): each stage lands at-or-better within normal
# adversarial run-to-run spread; the r64 stage additionally has the sin-A/B
# precedent that fast_sin converges better, not worse.
set -euo pipefail
cd "$(dirname "$0")/.."
RES=results/prog_shipped_r5
mkdir -p "$RES"
. tools/campaign_lib.sh

if [ ! -f datasets/blobs_256.zip ]; then
  mkdir -p datasets
  python -m cips3d_tpu.data.synthetic "datasets/blobs_{size}.zip" \
    --num 4000 --sizes 32,64,128,256 --seed 1
fi

wait_for_tunnel
PREV=""
for cmd in train_r32 train_r64 train_r128 train_r256; do
  EXTRA=()
  if [ -n "$PREV" ]; then
    EXTRA=(finetune_dir "$RES/$PREV/ckptdir/best_fid")
  fi
  for attempt in 1 2 3; do
    [ -s "$RES/$cmd.done" ] && break
    [ "$attempt" -gt 1 ] && echo "[prog_shipped] $cmd retry $attempt (resume)"
    # `resume true` is a no-op before the first checkpoint exists (the
    # finetune chaining from PREV then applies); on retry it continues
    # from the stage's own exact-resume tree.
    run_phase "$cmd" 5400 -- \
      python -m cips3d_tpu.train.cli \
        --config configs/synthetic_progressive.yaml --command "$cmd" --opts \
        outdir "$RES" \
        archive_eval_images true \
        resume true \
        "${EXTRA[@]}"
  done
  if [ ! -s "$RES/$cmd.done" ]; then
    echo "=== prog_shipped: $cmd INCOMPLETE after 3 attempts — stopping ===" >&2
    campaign_summary
    exit 1
  fi
  PREV="$cmd"
done

python tools/collect_campaign.py "$RES" docs/prog_shipped_r5 \
  --stages train_r32 train_r64 train_r128 train_r256
campaign_summary
seal_results "$RES"
echo "=== shipped-defaults progressive chain done ($(date)) ==="

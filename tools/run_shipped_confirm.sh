#!/bin/bash
# Round-5 shipped-defaults quality confirmation.
#
# The sin A/B v2 legs (results/sin_ab_r4, harvested into docs/sin_ab_r4/)
# forced `fused_dphase false` so the sine would be the only variable.  The
# SHIPPED flagship default that the A/B justified is a combination that has
# therefore never been quality-trained end-to-end: fast_sin + the
# auto-picked fused D-phase ray-tile kernel + the fused D-phase INR decode
# (+ the G-phase VJP pairing chosen by tools/measure_gvjp_ab.py this
# round).  All of those kernels are parity-tested, but 10k adversarial
# steps compound float-association differences; this campaign trains ONE
# leg with zero fused/sine overrides — exactly what a user gets from the
# config — and gates it against the committed A/B curves.
#
# Pre-registered gate (docs/sin_ab_r4/SUMMARY.json): PASS iff the shipped
# leg's last-5-eval-mean FID_surrogate beats the exact-sin leg's 0.0432 —
# i.e. the shipped combination must retain the quality win that justified
# flipping the default (fast leg: 0.0346).  Throughput is reported, not
# gated (the bench A/Bs already own that decision).
set -euo pipefail
cd "$(dirname "$0")/.."
RES=results/shipped_confirm_r5
mkdir -p "$RES"
. tools/campaign_lib.sh

ITERS="${1:-10000}"

wait_for_tunnel
for attempt in 1 2 3; do
  [ -s "$RES/shipped.done" ] && break
  [ "$attempt" -gt 1 ] && echo "[shipped_confirm] retry $attempt (resumes from $RES/shipped)"
  # `resume true` is a no-op on the first attempt and makes retries
  # continue from the checkpoint (exact: Adam moments + RNG chain fold).
  run_phase "shipped" 7200 -- \
    python -m cips3d_tpu.train.cli \
      --config configs/synthetic_progressive.yaml --command train_r64 --opts \
      outdir "$RES/shipped" \
      archive_eval_images true \
      total_iters "$ITERS" \
      resume true \
      load_finetune false
done
campaign_summary
# seal only a COMPLETE campaign (advisor round-4: sealing an incomplete
# tree blocks the checkpoint resume the retry loop depends on)
if [ -s "$RES/shipped.done" ]; then
  seal_results "$RES"
  echo "=== shipped-defaults confirmation done ==="
else
  echo "=== shipped-defaults confirmation INCOMPLETE — not sealing (rerun to resume) ===" >&2
  exit 1
fi

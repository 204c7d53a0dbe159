#!/bin/bash
# Round-4 sin A/B v2: exact sin vs the FIXED fast_sin (f32 internals —
# commit "fast_sin: f32 internals fix the bf16 range-reduction blowup").
#
# The round-2 A/B (docs/sin_ab/REPORT.md) found fast_sin converging ~10%
# worse on FID_surrogate and blamed the polynomial's derivative; round 4
# root-caused the real culprit: the bf16 range reduction quantized the
# reduced argument to ULP(y) (max sine error 0.205 vs the polynomial's
# 1.7e-5).  With f32 internals the bf16-input error is 2.0e-3 — identical
# to jnp.sin on the same bf16 argument — so the quality gap should close.
# If it does, the flagship training default flips to fast_sin (+~29%
# measured training throughput, round-2 numbers) with exact-parity quality.
#
# Two from-scratch 10k-step r64 runs, identical seed/config, differing only
# in generator.fast_sin; scored by the CURRENT texture surrogate with raw
# eval dumps archived (re-scorable on future metric changes).  Both legs
# are fresh (the round-2 curves used the old surrogate AND the broken
# fast_sin, so neither leg is reusable).
set -euo pipefail
cd "$(dirname "$0")/.."
RES=results/sin_ab_r4
mkdir -p "$RES"
. tools/campaign_lib.sh

ITERS="${1:-10000}"

wait_for_tunnel
for mode in exact fast; do
  if [ "$mode" = exact ]; then flag=false; else flag=true; fi
  for attempt in 1 2 3; do
    [ -s "$RES/$mode.done" ] && break
    [ "$attempt" -gt 1 ] && echo "[sin_ab_r4] $mode: retry $attempt (resumes from $RES/$mode resume tree)"
    # `resume true` is a no-op on the first attempt (no resume snapshot
    # yet) and makes retries continue from the checkpoint instead of
    # restarting at step 0 — the restart both wastes tunnel time and
    # contaminates the textdir curves with duplicate step ranges.  The
    # resume tree carries optimizer state, so the retry is exact.
    # fused_dphase false on BOTH legs: the auto-picker (on iff fast_sin)
    # would make the legs differ in the D-phase renderer as well as the
    # sine — a two-variable experiment.  Forcing false keeps the only
    # difference the sine implementation; the exact leg's auto-pick
    # already resolved to false, so this changes nothing there.  (The
    # first fast-leg attempt ran 6.4 img/s and initially implicated the
    # kernel, but an identical rerun after the tunnel session cycled hit
    # 124.8 img/s with the kernel ON — the slowdown was tunnel-state,
    # not the kernel; see docs/r3_campaign notes + probe_gspmd_kernel.)
    run_phase "$mode" 7200 -- \
      python -m cips3d_tpu.train.cli \
        --config configs/synthetic_progressive.yaml --command train_r64 --opts \
        generator.fast_sin "$flag" \
        fused_dphase false \
        outdir "$RES/$mode" \
        archive_eval_images true \
        total_iters "$ITERS" \
        resume true \
        load_finetune false
  done
done
campaign_summary
# seal only a COMPLETE campaign: run_phase returns 0 even on FAILED/TIMEOUT
# (it waits for the tunnel and lets the attempt loop retry), so after three
# exhausted attempts control still reaches here — sealing an incomplete tree
# would chmod it read-only and make _refuse_sealed_outdir block the very
# checkpoint resume the retry logic depends on (advisor round-4).
if [ -s "$RES/exact.done" ] && [ -s "$RES/fast.done" ]; then
  seal_results "$RES"
  echo "=== sin A/B v2 done ==="
else
  echo "=== sin A/B v2 INCOMPLETE — not sealing (rerun to resume) ===" >&2
  exit 1
fi

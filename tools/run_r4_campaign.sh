#!/bin/bash
# Round-4 TPU measurement campaign — the judge's round-3 verdict asked for a
# PROVING round: every unmeasured decision-critical number, prioritized so
# defaults can be set from evidence even if the tunnel dies partway.
# Resumable phase protocol (tools/campaign_lib.sh, non-empty markers) over
# the SAME results dir as round 3 so already-measured phases are skipped.
#
# Usage:  bash tools/run_r4_campaign.sh [results_dir]
#
# Decision each phase feeds:
#   t_exact_resid / t_exact_xla  -> FFHQ-recipe G-phase fused_ray default
#                                   (flip iff the residual VJP wins exact sin)
#   s_r256_ab                    -> serving fused-INR default (BENCH_AB=1:
#                                   fused-all vs XLA measured in ONE process,
#                                   eliminating cross-session tunnel variance)
#   r256_base / r256_dinr        -> TrainConfig.fused_dphase_inr default
#   prof_r256                    -> the ~64 ms copy in the r256 step (r2 carry)
#   aux_cliff / r256_aux         -> scan+aux cliff HLO root cause (r2 carry)
#   s_r512_ab                    -> r512 serving number (never timed)
#   t_fast_dinr                  -> fused D-INR effect at r64
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
RES="${1:-docs/r3_campaign}"
mkdir -p "$RES"
. tools/campaign_lib.sh
backfill_markers

echo "[campaign] waiting for tunnel..."
wait_for_tunnel
echo "[campaign] tunnel is up ($(date))"

run_phase t_exact_resid 1800 BENCH_FAST_SIN=0 BENCH_FUSED=1 BENCH_VJP=pallas_residual -- python bench.py
run_phase t_exact_xla   1800 BENCH_FAST_SIN=0 -- python bench.py
run_phase s_r256_ab     2400 BENCH_AB=1 -- python bench_inference.py
run_phase r256_base     2400 BENCH_DPHASE_INR=0 -- python tools/measure_r256_step.py 4 1 0
run_phase r256_dinr     2400 BENCH_DPHASE_INR=1 -- python tools/measure_r256_step.py 4 1 0
run_phase prof_r256     2400 PYTHONUNBUFFERED=1 -- \
  python tools/profile_step.py --stage-r256 --out "$RES/prof_r256"
run_phase aux_cliff     3000 PYTHONUNBUFFERED=1 -- python tools/analyze_scan_aux.py 256 4 10
run_phase r256_aux      2400 BENCH_DPHASE_INR=0 -- python tools/measure_r256_step.py 4 1 1
run_phase s_r512_ab     3600 BENCH_AB=1 -- python bench_inference.py 512
run_phase t_fast_dinr   1800 BENCH_FAST_SIN=1 BENCH_DPHASE_INR=1 -- python bench.py

echo "[campaign] r4 complete ($(date))"
campaign_summary

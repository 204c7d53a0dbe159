#!/bin/bash
# Prioritized continuation of tools/run_r3_campaign.sh — same resumable
# phase protocol (shared tools/campaign_lib.sh; non-empty markers, legacy
# empty markers backfilled), reordered so the decision-critical measurements
# land first when wall clock is short:
#   1. exact-sin residual-VJP vs XLA (decides the FFHQ-recipe G-phase default)
#   2. r256 step profile (the ~64 ms copy analysis, VERDICT r2 next #2)
#   3. scan+aux cliff HLO analysis (VERDICT r2 weak #3)
#   4. r256 stage timings (base / fused D-INR)
#   5. combined fused serving vs XLA same-session pair
# Phases already measured in round 3 with committed numbers (t_fast_fused,
# t_exact_fused, s_r256_ray) and the expensive r512 serving runs are left to
# the original script.
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
run_phase t_exact_xla   1500 BENCH_FAST_SIN=0 -- python bench.py
run_phase prof_r256 2400 PYTHONUNBUFFERED=1 -- \
  python tools/profile_step.py --stage-r256 --out "$RES/prof_r256"
run_phase aux_cliff 3000 PYTHONUNBUFFERED=1 -- python tools/analyze_scan_aux.py 256 4 10
run_phase r256_base 2400 BENCH_DPHASE_INR=0 -- python tools/measure_r256_step.py 4 1 0
run_phase r256_dinr 2400 BENCH_DPHASE_INR=1 -- python tools/measure_r256_step.py 4 1 0
run_phase s_r256_all  1500 BENCH_FUSED=1 BENCH_FUSED_INR=1 -- python bench_inference.py
run_phase s_r256_xla  1500 BENCH_FUSED=0 BENCH_FUSED_INR=0 -- python bench_inference.py
run_phase t_fast_dinr   1800 BENCH_FAST_SIN=1 BENCH_DPHASE_INR=1 -- python bench.py

echo "[campaign] p2 complete ($(date))"
campaign_summary

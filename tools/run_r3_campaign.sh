#!/bin/bash
# Round-3 TPU measurement campaign — runs unattended the moment the tunnel
# is healthy.  Each phase is its own python process (remote compiles are
# slow and the tunnel degrades with session age — fresh process per
# measurement), bounded by `timeout`, and records a non-empty marker file so
# the script is resumable: re-running skips phases that already produced
# results.  Shared phase machinery: tools/campaign_lib.sh.
#
# Usage:  bash tools/run_r3_campaign.sh [results_dir]
#
# Measurements (BENCH_NOTES.md round-3 follow-ups):
#   train r64 b4 bf16 (bench.py, 200 scanned steps):
#     t_fast_xla        fast_sin, XLA G-phase            (r2: 111.2 imgs/s)
#     t_fast_fused      fast_sin, fused recompute VJP    (r3: 108.9)
#     t_fast_resid      fast_sin, fused residual VJP     (r3: 104.9)
#     t_exact_xla       exact sin, XLA                   (r3: 81.8)
#     t_exact_resid     exact sin, fused residual VJP
#     t_exact_fused     exact sin, fused recompute VJP   (r3: 78.7)
#     t_fast_dinr       fast_sin, XLA G-phase + fused D-phase INR
#   serving (bench_inference.py, 16-frame scan):
#     s_r256_all        fused ray + fused INR + fast_sin
#     s_r256_ray        fused ray only                   (r3: 88.9 fps)
#     s_r256_xla        XLA                              (r3 session: 60.8)
#     s_r512_all / s_r512_xla   r512 stretch
#   r256 train stage (tools/measure_r256_step.py, 10-step scans):
#     r256_base         shipped stage                    (r2: 238 ms/step)
#     r256_dinr         + fused D-phase INR
#     r256_aux          aux probe (scan+aux cliff)       (r2: ~655 ms/step)
#   profile:
#     prof_r256         jax.profiler trace of the r256 step (copy analysis)

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

# --- training r64 (driver metric family) --------------------------------
run_phase t_fast_xla    1500 BENCH_FAST_SIN=1 -- python bench.py
run_phase t_fast_resid  1800 BENCH_FAST_SIN=1 BENCH_FUSED=1 BENCH_VJP=pallas_residual -- python bench.py
run_phase t_fast_fused  1800 BENCH_FAST_SIN=1 BENCH_FUSED=1 BENCH_VJP=pallas -- python bench.py
run_phase t_exact_xla   1500 BENCH_FAST_SIN=0 -- python bench.py
run_phase t_exact_resid 1800 BENCH_FAST_SIN=0 BENCH_FUSED=1 BENCH_VJP=pallas_residual -- python bench.py
run_phase t_exact_fused 1800 BENCH_FAST_SIN=0 BENCH_FUSED=1 BENCH_VJP=pallas -- python bench.py
run_phase t_fast_dinr   1800 BENCH_FAST_SIN=1 BENCH_DPHASE_INR=1 -- python bench.py

# --- serving -------------------------------------------------------------
run_phase s_r256_all  1500 BENCH_FUSED=1 BENCH_FUSED_INR=1 -- python bench_inference.py
run_phase s_r256_ray  1500 BENCH_FUSED=1 BENCH_FUSED_INR=0 -- python bench_inference.py
run_phase s_r256_xla  1500 BENCH_FUSED=0 BENCH_FUSED_INR=0 -- python bench_inference.py
run_phase s_r512_all  2400 BENCH_FUSED=1 BENCH_FUSED_INR=1 -- python bench_inference.py 512
run_phase s_r512_xla  2400 BENCH_FUSED=0 BENCH_FUSED_INR=0 -- python bench_inference.py 512

# --- r256 train stage ----------------------------------------------------
run_phase r256_base 2400 BENCH_DPHASE_INR=0 -- python tools/measure_r256_step.py 4 1 0
run_phase r256_dinr 2400 BENCH_DPHASE_INR=1 -- python tools/measure_r256_step.py 4 1 0
run_phase r256_aux  2400 BENCH_DPHASE_INR=0 -- python tools/measure_r256_step.py 4 1 1
# HLO-level evidence for the scan+aux cliff (compile-only, no timing)
run_phase aux_cliff 3000 PYTHONUNBUFFERED=1 -- python tools/analyze_scan_aux.py 256 4 10

# --- profile (trace for the copy-time analysis) --------------------------
run_phase prof_r256 2400 PYTHONUNBUFFERED=1 -- \
  python tools/profile_step.py --stage-r256 --out "$RES/prof_r256"

echo "[campaign] complete ($(date)); summary:"
campaign_summary

# tools/campaign_lib.sh — shared phase runner for the TPU measurement
# campaigns (sourced by run_r*_campaign*.sh; advisor round-3: the probe /
# run_phase duplication between the r3 scripts let an empty-vs-non-empty
# marker mismatch creep in, so both now source this).
#
# Contract: the caller sets RES (results dir) before sourcing.  Phase
# completion markers are NON-EMPTY "$RES/<name>.done" files; the skip check
# and the summary both test [ -s ].  backfill_markers upgrades legacy empty
# markers (created by bare `touch` in the original round-3 script) so
# finished phases are never re-run and never misreported as FAIL.

# Double-launch guard (auto-acquired when this lib is sourced): two
# concurrent campaign instances over one RES interleave writers on the same
# logs and resume/checkpoint trees (round 4: a duplicate run_sin_ab_r4.sh
# launch put two trainers in results/sin_ab_r4/exact simultaneously).
# mkdir is the atomic primitive; a lock whose recorded PID is dead is stale
# and reclaimed.
acquire_campaign_lock() {
  local lock="$RES/.campaign.lock" holder
  mkdir -p "$RES"
  if ! mkdir "$lock" 2>/dev/null; then
    holder=$(cat "$lock/pid" 2>/dev/null || echo 0)
    if [ "$holder" -gt 0 ] 2>/dev/null && kill -0 "$holder" 2>/dev/null; then
      echo "[campaign] another instance (pid $holder) owns $RES — refusing to double-launch" >&2
      exit 1
    fi
    # stale reclaim must itself be atomic: `rm -rf` then mkdir is not — a
    # second launcher's rm could delete the FIRST reclaimer's fresh lock
    # after its mkdir won, and both would proceed (the round-4 TOCTOU in a
    # new spot).  mv(rename) of the stale dir is atomic: exactly one
    # launcher's mv succeeds, it alone retries the mkdir; every other
    # launcher's mv fails (ENOENT) and it exits.
    echo "[campaign] reclaiming stale lock (pid ${holder:-?} is dead)"
    if ! mv "$lock" "$lock.stale.$$" 2>/dev/null; then
      echo "[campaign] lost the reclaim race for $RES — refusing to double-launch" >&2
      exit 1
    fi
    rm -rf "$lock.stale.$$"
    if ! mkdir "$lock" 2>/dev/null; then
      echo "[campaign] lost the reclaim race for $RES — refusing to double-launch" >&2
      exit 1
    fi
  fi
  echo $$ > "$lock/pid"
  trap 'rm -rf "$RES/.campaign.lock"' EXIT
}

probe() {
  # 420s: remote compile through the relay is 1-3 min and per-dispatch
  # latency grows with tunnel age (CLAUDE.md); 240s produced false
  # "tunnel down" verdicts while a 300s-budget manual probe succeeded.
  timeout 420 python -c "
import jax, jax.numpy as jnp
float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum())
print('TUNNEL_OK')" 2>&1 | grep -q TUNNEL_OK
}

wait_for_tunnel() {
  until probe; do
    echo "[campaign] tunnel down, waiting 300s ($(date))"
    sleep 300
  done
}

backfill_markers() {
  local f
  for f in "$RES"/*.done; do
    [ -e "$f" ] && [ ! -s "$f" ] && echo done > "$f"
  done
  return 0
}

run_phase() {  # name timeout_s env_pairs... -- cmd...
  local name="$1" tmo="$2"; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  if [ -s "$RES/$name.done" ]; then
    echo "[campaign] $name: already done, skipping"
    return 0
  fi
  echo "[campaign] $name: starting ($(date))"
  if [ -e "$RES/$name.log" ]; then
    # rotate, never overwrite: a retry's log must not clobber the evidence
    # of what the previous attempt did (round-4: a retry erased the first
    # 4250 steps of a sin-A/B leg's log)
    local i=1
    while [ -e "$RES/$name.log.$i" ]; do i=$((i + 1)); done
    mv "$RES/$name.log" "$RES/$name.log.$i"
  fi
  if env "${envs[@]}" timeout "$tmo" "$@" > "$RES/$name.log" 2>&1; then
    echo done > "$RES/$name.done"
    echo "[campaign] $name: OK"
    tail -n 3 "$RES/$name.log"
  else
    echo "[campaign] $name: FAILED/TIMEOUT (exit $?) — see $RES/$name.log"
    wait_for_tunnel
  fi
}

campaign_summary() {
  local f n s
  for f in "$RES"/*.log; do
    [ -e "$f" ] || continue
    n=$(basename "$f" .log)
    # the outer wrapper's own log lives in $RES too and has no .done marker;
    # it is not a phase and must not be reported FAIL (round-4: the sin A/B
    # driver log ended "[FAIL]" with both legs green)
    [ "$n" = campaign_driver ] && continue
    if [ -s "$RES/$n.done" ] || grep -q '{"metric"' "$f"; then s=OK; else s=FAIL; fi
    echo "== $n [$s]"
    # `|| true`: a phase log with no metric lines must not abort the caller
    # under `set -euo pipefail` — the round-5 shipped-confirm wrapper died
    # here (training logs print "img/s", matching none of these patterns)
    # and never reached seal_results
    grep -E '\{"metric"|ms/step|fps|imgs|img/s' "$f" | tail -n 2 || true
  done
}

# seal_results <dir>: mark the campaign complete (CAMPAIGN_SEALED — the
# train CLI refuses to reuse an outdir under a sealed tree), write a MANIFEST
# of sha256 hashes, and make every file read-only, so a stray relaunch cannot
# silently overwrite committed evidence (the sin-A/B overwrite incident,
# docs/sin_ab/REPORT.md "Provenance note").
seal_results() {
  local dir="${1:-$RES}"
  date -u +"sealed %Y-%m-%dT%H:%M:%SZ" > "$dir/CAMPAIGN_SEALED"
  ( cd "$dir" && find . -type f ! -name MANIFEST.sha256 \
        ! -path './.campaign.lock/*' -print0 \
      | sort -z | xargs -0 sha256sum > MANIFEST.sha256 )
  find "$dir" -type f ! -path "$dir/.campaign.lock/*" -exec chmod a-w {} +
  echo "[campaign] sealed $dir ($(wc -l < "$dir/MANIFEST.sha256") files)"
}

acquire_campaign_lock

#!/bin/bash
# One healthy-relay window -> every pending TPU measurement, safest first.
#
# STATUS 2026-08-19: every step below HAS BEEN captured (steps 1-5 in
# docs/tpu_session_r05.log + the full bs16 bisect ledger in
# docs/bs16_triage.md — triage complete, bs8 confirmed optimal). Nothing
# is pending; this script remains as the template for future windows.
#
# The axon relay dies for hours at a time (CLAUDE.md round 3/4 notes), so
# when it IS up, capture everything in one go. Order matters:
#   1. bench.py            — the 4 driver JSON lines (headline evidence).
#      With the persistent compile cache (utils/compile_cache.py) warm,
#      a rerun costs minutes, not an hour — run it FIRST to warm the cache
#      the driver's own run will hit.
#   2. bench_beam_parts    — per-component decode step split (stacked cache)
#   3. bench_decode trained— early-exit decode with real trained weights
#   4. bench_bn ab stem128 — the sanctioned architecture A/B (lrs3, then lrw)
#   5. bisect_bs16         — LAST: a crash wedges the relay 20-40 min
# Each step runs in its own process (one relay session per measurement) with
# a hard timeout; results stream to $LOG as they happen (no tail buffering —
# round-4's log lost step 2+ output to a `| tail` that never flushed).
#
# Usage:  bash syncvsr_tpu/tools/tpu_session.sh [log_file] [start_step]
set -u
LOG=${1:-/tmp/tpu_session_$(date +%m%d_%H%M).log}
START=${2:-1}
cd "$(dirname "$0")/../.."

run() { # run <step> <timeout_s> <desc> <cmd...>
  local step=$1 t=$2 desc=$3; shift 3
  [ "$step" -lt "$START" ] && return 0
  echo "=== [$step] $desc ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "--- [$step] rc=$rc ---" | tee -a "$LOG"
  if [ "$rc" -ne 0 ] && [ "$step" -le 2 ]; then
    echo "early step failed — relay likely sick; aborting session" | tee -a "$LOG"
    exit "$rc"
  fi
}

run 1 1800 "bench.py 4-line capture (warm-cache path the driver will hit)" \
    python bench.py
run 2 1500 "beam decode component split" \
    python -m syncvsr_tpu.tools.bench_beam_parts 500 40
run 3 2400 "trained-weights early-exit decode, T=500" \
    python -m syncvsr_tpu.tools.bench_decode trained 500
run 4 1800 "BN stem128 A/B (lrs3)" \
    python -m syncvsr_tpu.tools.bench_bn ab lrs3 default,stem128
run 5 1800 "BN stem128 A/B (lrw)" \
    python -m syncvsr_tpu.tools.bench_bn ab lrw default,stem128
# The bisect can CRASH the TPU worker (that is its signal) — keep it last,
# one variant per window; next windows continue with encoder/model/bs12.
run 6 1200 "bs16 bisect: frontend (CRASH RISK — last)" \
    python -m syncvsr_tpu.tools.bisect_bs16 frontend
echo "session complete: $LOG"

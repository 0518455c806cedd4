#!/bin/bash
# campaign3 continuation with the separable scout pool: v11 sweep + stage
# profile, then chain straight into campaign4 + hybrid + 35k (overnight).
set -u
cd "$(dirname "$0")/.."
OUT=.cache/campaign3_r3
mkdir -p "$OUT"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/campaign.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $name ($(date -u +%H:%M:%S))" | tee -a "$OUT/campaign.log"
}

run sweep_v11 3000 env FOX_CACHE=fox_16k.pkl python tools/sweep_baked.py v11
run profile_round 1500 env FOX_CACHE=fox_16k.pkl SIENERF_CULL=brick SIENERF_FINE=row \
    python tools/profile_baked_round.py 64 16 4.0 16

bash tools/overnight_r3.sh

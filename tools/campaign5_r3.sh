#!/bin/bash
# Reordered: fidelity diags FIRST (they gate the bench validity fix), then
# speed sweeps/profile, then hybrid.  Strictly serialized.
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

run diag_r256_16 1800 env FOX_CACHE=fox_16k.pkl BAKE_BITS=16 python tools/diag_bake_fidelity.py
run diag_r256_8  1500 env FOX_CACHE=fox_16k.pkl python tools/diag_bake_fidelity.py
run sweep_v11 3000 env FOX_CACHE=fox_16k.pkl python tools/sweep_baked.py v11
run scout_ab 2000 env FOX_CACHE=fox_16k.pkl python tools/sweep_baked.py adv
run profile_round 1500 env FOX_CACHE=fox_16k.pkl SIENERF_CULL=brick SIENERF_FINE=row \
    python tools/profile_baked_round.py 64 16 4.0 16
run diag_r320_8 2400 env FOX_CACHE=fox_16k.pkl BAKE_R=320 python tools/diag_bake_fidelity.py

echo "=== hybrid ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/campaign.log"
timeout 2400 env FOX_CACHE=fox_16k.pkl python tools/bench_hybrid.py > "$OUT/hybrid.log" 2>&1
echo "rc=$? hybrid ($(date -u +%H:%M:%S))" | tee -a "$OUT/campaign.log"
echo "campaign5 done $(date -u)" | tee -a "$OUT/campaign.log"

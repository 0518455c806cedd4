#!/bin/bash
# Round-3 campaign #4: bake-fidelity decomposition (the 27 dB baked-vs-live
# gap on the sharp field) + scout-advance A/B.  Strictly serialized.
set -u
cd "$(dirname "$0")/.."
OUT=.cache/campaign4_r3
mkdir -p "$OUT"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/campaign.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $name ($(date -u +%H:%M:%S))" | tee -a "$OUT/campaign.log"
}

# 1. fidelity decomposition at the shipping bake (R=256 int8)
run diag_r256_8 1800 env FOX_CACHE=fox_16k.pkl python tools/diag_bake_fidelity.py
# 2. int16 rows: isolates the quantization term
run diag_r256_16 1800 env FOX_CACHE=fox_16k.pkl BAKE_BITS=16 python tools/diag_bake_fidelity.py
# 3. R=320: isolates the spatial term
run diag_r320_8 2400 env FOX_CACHE=fox_16k.pkl BAKE_R=320 python tools/diag_bake_fidelity.py
# 4. scout-advance A/B at the winner config
run scout_ab 2400 env FOX_CACHE=fox_16k.pkl python tools/sweep_baked.py adv

echo "campaign4 done $(date -u)" | tee -a "$OUT/campaign.log"

#!/bin/bash
# Round-3 main TPU campaign (post fox_16k rebuild). Strictly serialized —
# ONE TPU client at a time (NOTES_ROUND2 infra gotchas).
set -u
cd "$(dirname "$0")/.."
OUT=.cache/campaign2_r3
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/campaign.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $name ($(date -u +%H:%M:%S))" | tee -a "$OUT/campaign.log"
}

# 1. Hash-backward A/B: batched (new default) vs per-level (round-2 path)
run train_batched  1500 env FOX_CACHE=fox_16k.pkl python tools/profile_train.py
run train_perlevel 1500 env FOX_CACHE=fox_16k.pkl SIENERF_HASH_BWD=perlevel python tools/profile_train.py

# 2. Brick-era render sweep on the corrected brick paths (b4fee11)
run sweep_v10 3000 env FOX_CACHE=fox_16k.pkl python tools/sweep_baked.py v10

echo "campaign2 phase A done $(date -u)" | tee -a "$OUT/campaign.log"

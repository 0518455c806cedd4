#!/bin/bash
# Round-3 campaign #3: fused-ray flush + hoisted occupancy pack + byte-plane
# onehot selects.  Strictly serialized — ONE TPU client at a time.
set -u
cd "$(dirname "$0")/.."
OUT=.cache/campaign3_r3
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/campaign.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $name ($(date -u +%H:%M:%S))" | tee -a "$OUT/campaign.log"
}

# 1. bench: quality-gated end-to-end drive of the new render code
run bench 1800 python bench.py

# 2. hash-backward A/B completion (batched default vs per-level; the
#    batched leg timed out last campaign when a CPU export starved it)
run train_batched 1800 env FOX_CACHE=fox_16k.pkl python tools/profile_train.py

# 3. v11 sweep: per-round overhead levers at the brick/row winner
run sweep_v11 3000 env FOX_CACHE=fox_16k.pkl python tools/sweep_baked.py v11

# 4. fresh stage decomposition at the winner config
run profile_round 1500 env FOX_CACHE=fox_16k.pkl SIENERF_CULL=brick SIENERF_FINE=row \
    python tools/profile_baked_round.py 64 16 4.0 16

echo "campaign3 done $(date -u)" | tee -a "$OUT/campaign.log"

#!/bin/bash
# Round-3 overnight chain: bake-fidelity campaign -> hybrid number ->
# 35k-step reference-protocol run (checkpointed, wall-bounded).
# Strictly serialized; launch only when no other TPU client is running.
set -u
cd "$(dirname "$0")/.."
OUT=.cache/overnight_r3
mkdir -p "$OUT"

bash tools/campaign4_r3.sh

echo "=== hybrid ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/chain.log"
timeout 2400 env FOX_CACHE=fox_16k.pkl python tools/bench_hybrid.py \
    > "$OUT/hybrid.log" 2>&1
echo "rc=$? hybrid ($(date -u +%H:%M:%S))" | tee -a "$OUT/chain.log"

echo "overnight chain done (35k launched separately) $(date -u)" | tee -a "$OUT/chain.log"

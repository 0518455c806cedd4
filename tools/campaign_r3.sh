#!/bin/bash
# Round-3 TPU campaign: the serialized follow-ups that round 2 ran out of
# clock for.  ONE TPU client at a time (two concurrent jax processes wedge
# the axon tunnel grant — NOTES_ROUND2.md "Infra gotchas"); this script is
# strictly sequential, each stage logs to .cache/campaign_r3/.
#
# Prereq: .cache/fox_16k.pkl (or fox_4k.pkl).  If the box was wiped, rebuild:
#   python - <<'EOF'
#   import sys; sys.path.insert(0, ".")
#   from tools.profile_render import get_state
#   get_state(n_bundles=192, cache_name="fox_4k.pkl")
#   EOF
#   python tools/train_fox_more.py fox_4k.pkl 614 fox_16k.pkl
#
# Usage: bash tools/campaign_r3.sh [&]   (from the repo root)

set -u
cd "$(dirname "$0")/.."
OUT=.cache/campaign_r3
mkdir -p "$OUT"
FIELD=fox_16k.pkl
[ -f ".cache/$FIELD" ] || FIELD=fox_4k.pkl

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/campaign.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $name" | tee -a "$OUT/campaign.log"
}

# 1. Decompose the ~0.75s/frame that is not gather rate (NOTES_ROUND2
#    "Sixth builder window"): cumulative stage prefixes at the v6 winner.
run round_prof 1500 env FOX_CACHE=$FIELD python tools/profile_baked_round.py 64 16 4.0 16

# 2. Sort-free flush A/B at the shipping config (flush argsort is the prime
#    suspect in the per-round cost; bit-exact equivalence already tested).
run flush_argsort 1200 env FOX_CACHE=$FIELD python tools/sweep_baked.py best
run flush_unique 1200 env FOX_CACHE=$FIELD SIENERF_FLUSH=unique python tools/sweep_baked.py best

# 3. bf16-packed training gathers A/B (expected ~2x on the training
#    forward's gather bytes — profile_train shows it is the dominant stage).
run train_prof_fp32 1200 env FOX_CACHE=$FIELD python tools/profile_train.py
run train_prof_bf16 1200 env FOX_CACHE=$FIELD SIENERF_TRAIN_PACK=bf16 python tools/profile_train.py

# 4. Fox novel-view at the reference-ish budget (ds2; ~0.7 s/step on the
#    42-image split -> plan ~75 min for 6144 steps).
run fox_nv_ds2 7200 python tools/benchmark_quality.py fox --n_steps 6144 --downscale 2

echo "campaign done $(date -u)" | tee -a "$OUT/campaign.log"

#!/bin/bash
# Round-5 reference-protocol campaign (VERDICT r4 #3/#4): complete the 35k
# schedule by RESUMING the r4 wall-capped checkpoints, then evaluate every
# renderer at the reference protocol (all test views, spp 8, black bg,
# minT 1e-4 — reference scripts/run.py:179,210-268).  The spp-8 evals
# exercise the round-5 slab-phase (sweep) / chain-phase (baked) jitter.
# ONE process at a time — the axon tunnel wedges with concurrent clients
# (measured this round: a parallel CPU pytest run stalled the trainer).
set -x
cd /root/repo

# fox: resume 20480 -> 35000, live eval at completion (automatic)
python tools/benchmark_quality.py fox --n_steps 35000 --downscale 4 \
  --snapshot .cache/fox35k.snap --checkpoint_every 8192 \
  --save_snapshot .cache/fox35k.snap
python tools/benchmark_quality.py fox --snapshot .cache/fox35k.snap \
  --eval_only --renderer baked --downscale 4
python tools/benchmark_quality.py fox --snapshot .cache/fox35k.snap \
  --eval_only --renderer sweep --downscale 4

# synth: resume 8192 -> 35000 + all three renderer rows
python tools/benchmark_quality.py synth --n_steps 35000 \
  --snapshot .cache/synth35k.snap --checkpoint_every 8192 \
  --save_snapshot .cache/synth35k.snap
python tools/benchmark_quality.py synth --snapshot .cache/synth35k.snap \
  --eval_only --renderer baked
python tools/benchmark_quality.py synth --snapshot .cache/synth35k.snap \
  --eval_only --renderer sweep

# re-anchor the committed bench field on the 35k fox run (VERDICT #10)
python tools/export_render_snapshot.py .cache/fox35k.snap \
  data/fox_render.snap fp8 .cache/fox_split/transforms_train.json

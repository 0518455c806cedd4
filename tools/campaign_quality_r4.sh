#!/bin/bash
# Round-4 reference-protocol quality campaign (VERDICT r3 next #2).
#
# fox-split to 35k steps (reference scripts/run.py:179 default schedule),
# then the synthetic benchmark wall-capped toward 35k; each scene evaluated
# with BOTH renderers (live + baked) at the reference eval protocol
# (run.py:210-268: all test views, spp 8, black bg, minT 1e-4).
# Checkpoints every 4096 steps survive box resets.
set -x
cd /root/repo

test -f .cache/fox_split/transforms_train.json || \
  python tools/split_transforms.py /root/reference/data/nerf/fox --every 8 --out_dir .cache/fox_split

python tools/benchmark_quality.py fox --n_steps 35000 --downscale 4 \
  --checkpoint_every 4096 --save_snapshot .cache/fox35k.snap \
  --max_train_s 4200
python tools/benchmark_quality.py fox --snapshot .cache/fox35k.snap \
  --eval_only --renderer baked --downscale 4

test -f .cache/synth_bunny400/transforms_train.json || \
  python tools/make_synthetic_nerf.py .cache/synth_bunny400 --res 400

python tools/benchmark_quality.py synth --n_steps 35000 \
  --checkpoint_every 4096 --save_snapshot .cache/synth35k.snap \
  --max_train_s 1800
python tools/benchmark_quality.py synth --snapshot .cache/synth35k.snap \
  --eval_only --renderer baked

"""Sweep the baked renderer's knobs on real TPU with telemetry.

Prints per config: ms/frame, Mrays/s, rounds, ray-rounds, fine evals,
overflow count, PSNR vs the reference frame (first config's output, or a
cross-run ref image via REF_NPY=path.npy — written if missing, loaded if
present, so different bake resolutions compare against one fixed ss=1
R=256 frame).

Usage: FOX_CACHE=fox_4k.pkl [BAKE_R=256] [REF_NPY=/tmp/ref720.npy] \
         python tools/sweep_baked.py [configset]
configset: v3 (default — overflow/advance A/Bs) | v2 (round-2 tile sweep)
"""

import os
import sys
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402

W, H = 1280, 720

CONFIG_SETS = {
    # round-2 sweep: tile sizes and no-cull A/B
    "v2": [
        dict(candidates=128, evals=32, step_scale=1.0, advance_iters=16),
        dict(candidates=64, evals=32, step_scale=2.0, advance_iters=16),
        dict(candidates=64, evals=64, step_scale=2.0, advance_iters=16),
        dict(candidates=64, evals=32, step_scale=2.0, advance_iters=16, tile=1 << 17),
        dict(candidates=64, evals=32, step_scale=2.0, advance_iters=16, tile=1 << 20),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16),
        dict(candidates=128, evals=64, step_scale=2.0, advance_iters=16, tile=1 << 20),
    ],
    # round-2 best was P=64/evals=32/ss=4 (3.68 s) with 94% of rounds
    # overflowing at evals=32 and an unexplained P-independent per-round
    # cost.  v3 probes the two hypotheses: (a) overflow rollback waste —
    # raise evals toward no-cull; (b) the per-round serial DDA advance —
    # drop advance_iters to 0/4 (candidate bit-culls already skip gaps
    # shorter than the chain span).
    "v3": [
        dict(candidates=128, evals=32, step_scale=1.0, advance_iters=16),  # ref
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16),   # r2 best
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=0),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=4),
        dict(candidates=64, evals=48, step_scale=4.0, advance_iters=0),
        dict(candidates=64, evals=64, step_scale=4.0, advance_iters=0),    # no-cull
        dict(candidates=96, evals=48, step_scale=4.0, advance_iters=0),
        dict(candidates=64, evals=48, step_scale=2.0, advance_iters=0),
        dict(candidates=128, evals=48, step_scale=4.0, advance_iters=0, tile=1 << 17),
        # amortize the flush/refill tail over several march/eval passes
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=0, flush_every=2),
        dict(candidates=64, evals=48, step_scale=4.0, advance_iters=0, flush_every=4),
        # frame-init advance depth (default 160 serial DDA iters x2 ends)
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=0,
             init_advance_iters=32),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=0,
             init_advance_iters=0),
    ],
    # v4: the per-frame FIXED cost hypothesis.  Per-ray-round accounting of
    # the r2-best frame (3516 ms, 15 rounds, 0.92M ray-rounds) leaves ~2 s
    # unexplained by the stage profile (102 ms/round x 15) — which matches
    # the frame-level init advance+retreat: 160 serial DDA iters x 2 over
    # ALL 921k rays.  v4 sweeps init depth (the packed-word probes from
    # ops/bits.py make each iter ~2.5x cheaper, so this also A/Bs that),
    # plus flush amortization and tile width at the winning init depth.
    "v4": [
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16),   # r2 best (init 160)
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16,
             init_advance_iters=16),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16,
             init_advance_iters=0),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=32,
             init_advance_iters=0),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16,
             init_advance_iters=16, flush_every=2),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16,
             init_advance_iters=16, tile=1 << 17),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16,
             init_advance_iters=16, tile=1 << 17, flush_every=2),
        # quality rung at the lean init (bench.py ships ss=2)
        dict(candidates=64, evals=32, step_scale=2.0, advance_iters=16,
             init_advance_iters=16),
        dict(candidates=64, evals=32, step_scale=2.0, advance_iters=16,
             init_advance_iters=16, tile=1 << 17, flush_every=2),
    ],
    # v5: refine around the v4 winner on the converged fox_16k field
    # (sharper fields have fewer live samples/ray -> the optimum moves);
    # SIENERF_FLUSH=unique is the companion flag A/B at the same configs.
    "v5": [
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),  # v4 best
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16,
             init_advance_iters=48),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=24,
             init_advance_iters=24),
        dict(candidates=96, evals=40, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=64, evals=24, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=48, evals=24, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        # quality rung
        dict(candidates=64, evals=32, step_scale=2.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=128, evals=48, step_scale=1.0, advance_iters=16,
             init_advance_iters=32),
    ],
    # v6: sharp-field tail for the converged (>=12k-step) fox field — the
    # fog collapses (3840-step fields have 67% of candidates at density>1),
    # so live samples/ray drop severalfold and smaller eval windows stop
    # overflowing; probe ev=16 and shallower candidate chains.
    "v6": [
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),  # v4 best, the cross-field reference
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=48, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=32, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=48, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32, flush_every=2),
        # quality rung at the sharp field
        dict(candidates=64, evals=24, step_scale=2.0, advance_iters=16,
             init_advance_iters=32),
    ],
    # v7: per-round-overhead attack around the v6 winner (fox_16k).  The
    # unexplained ~33 ms/round is suspected to be (a) the 16 serial DDA
    # iterations of the per-round advance — the candidate chain's bit cull
    # already skips empty space vectorized, so the DDA may be redundant —
    # and/or (b) the width-P compaction sort (SIENERF_COMPACT=onehot is the
    # companion flag A/B at the same configs).
    "v7": [
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),  # v6 winner, the reference row
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=8,
             init_advance_iters=32),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=4,
             init_advance_iters=32),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=0,
             init_advance_iters=32),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=0,
             init_advance_iters=48),
        dict(candidates=96, evals=16, step_scale=4.0, advance_iters=0,
             init_advance_iters=32),
        dict(candidates=128, evals=16, step_scale=4.0, advance_iters=0,
             init_advance_iters=32),
    ],
    # v8: re-tune the operating point under cheaper (word-gather) bit
    # probes — probe cost drops ~linearly with P, so richer chains and
    # shallower advances may win back rounds (run with SIENERF_BITS=word).
    "v8": [
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),  # v6 winner, the reference row
        dict(candidates=96, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=96, evals=24, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=8,
             init_advance_iters=32),
        dict(candidates=96, evals=16, step_scale=4.0, advance_iters=8,
             init_advance_iters=32),
        dict(candidates=128, evals=24, step_scale=4.0, advance_iters=8,
             init_advance_iters=32),
    ],
    # v9: eval-window re-tune under the coarse cull (default SIENERF_CULL):
    # coarse keeps ~15% more candidates, so 73% of ray-rounds overflow at
    # ev=16 and re-probe their rolled-back span — a wider window trades
    # gather slots against probe/advance re-work.
    "v9": [
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),  # coarse-cull reference row
        dict(candidates=64, evals=20, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=64, evals=24, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=80, evals=20, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
        dict(candidates=96, evals=24, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
    ],
    # single-config set: the shipping v6 winner, for one-flag A/Bs
    # (SIENERF_BITS / SIENERF_FLUSH / SIENERF_COMPACT)
    "winner": [
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32),
    ],
    # v10: the brick-dedup era (ninth window).  Probes and fine gathers are
    # descriptor-limited; chain dedup through 4x4x8 bit-bricks
    # (SIENERF_CULL=brick) and 2x2x4 256-byte feature bricks
    # (SIENERF_FINE=brick) cut descriptor counts ~4x / ~2x.  A/B the four
    # pipeline combos at the v6 winner, then re-tune (P, evals, heads) under
    # the cheaper probes (a config's `env` dict is applied + jit caches
    # cleared before its run).
    "v10": [
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "coarse", "SIENERF_FINE": "row"}),  # pre-brick ref
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "coarse", "SIENERF_FINE": "brick"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "brick"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "brick",
                  "SIENERF_CULL_HEADS": "12"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "brick",
                  "SIENERF_CULL_HEADS": "24"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "brick",
                  "SIENERF_FINE_HEADS": "12"}),
        # cheaper probes shift the P sweet spot up
        dict(candidates=96, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "brick",
                  "SIENERF_CULL_HEADS": "24"}),
        dict(candidates=128, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "brick",
                  "SIENERF_CULL_HEADS": "32"}),
        dict(candidates=96, evals=24, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "brick",
                  "SIENERF_CULL_HEADS": "24"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=8,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "brick"}),
    ],
    # v11: per-round overhead attack on the v10 winner (CULL=brick,
    # FINE=row, 1130 ms).  The frame is eval-limited (ev window ~97%
    # utilized) but ~60% of each round is non-gather overhead (advance,
    # flush, probe+merge bookkeeping).  Probe: (a) coarser sampling
    # ladders (ss up — fewer total evals, quality-gated by the caller),
    # (b) wider tiles (halve round count, amortize true fixed costs),
    # (c) flush amortization, (d) shallower per-round advance under the
    # brick cull, (e) wider eval windows (fewer rounds at same gathers).
    "v11": [
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row"}),  # v10 winner
        dict(candidates=64, evals=16, step_scale=5.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row"}),
        dict(candidates=64, evals=16, step_scale=6.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32, tile=1 << 17,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32, tile=1 << 18,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32, flush_every=2,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=8,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row"}),
        dict(candidates=64, evals=24, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row"}),
        dict(candidates=96, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32, tile=1 << 17, flush_every=2,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row"}),
    ],
    # v12: fine-brick revival under the byte-plane one-hot selects (the
    # HIGHEST-precision einsums were ~3x the MXU work; v10's fine=brick
    # loss may flip).  Head-budget ladder at the winner geometry.
    "v12": [
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row"}),  # ref
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "brick",
                  "SIENERF_FINE_HEADS": "8"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "brick",
                  "SIENERF_FINE_HEADS": "12"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "brick",
                  "SIENERF_FINE_HEADS": "16"}),
        dict(candidates=64, evals=20, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "brick",
                  "SIENERF_FINE_HEADS": "12"}),
    ],
    # v13: distance-field advance A/B at the brick/row winner, then chain-
    # length retune under it (an accurate jump to the occupied boundary
    # raises the cull keep-rate, so shorter chains may stop overpaying
    # probes without costing rounds)
    "v13": [
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dda"}),  # v12 winner ref
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dist"}),  # 4 jumps/round, 4-jump init
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=8,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dist"}),  # 2 jumps/round
        dict(candidates=48, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dist"}),
        dict(candidates=32, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dist"}),
        dict(candidates=48, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "coarse", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dist"}),
    ],
    # v14: retune around the v13 winner (P=64/ev=16/ss=4/ADV=dist 992 ms —
    # training-grid chamfer jumps): jump depth, init depth, flush grouping
    # and eval window re-checks under the new cost balance
    "v14": [
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dist"}),  # v13 winner ref
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=24,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dist"}),  # 6 jumps/round
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=32,
             init_advance_iters=64,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dist"}),  # 8 jumps + deep init
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=96,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dist"}),  # 12 init jumps only
        dict(candidates=64, evals=20, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dist"}),  # wider eval window
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32, flush_every=2,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dist"}),
        dict(candidates=96, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dist"}),  # longer chains: fewer rounds?
    ],
    # round-4 descriptor-budget attack (VERDICT r3 next #1).  Frame cost
    # model (NOTES_ROUND4 roofline): every stage is gather-DESCRIPTOR-
    # limited at the measured ~88M rows/s wall, so ms/frame ~ total
    # descriptors issued.  Winner cfg spends ~42/ray-round (8 dist jumps +
    # 16 brick cull heads + 16 fine rows + flush); these configs attack
    # each term: flush amortization, brick fine gather (post byte-plane
    # onehot fix), fewer jumps, longer chains (fixed costs per round
    # amortize over more candidates), and the no-cull limit (at fox's
    # ~47% live-bit fraction the cull probes barely pay for themselves).
    "v15": [
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=32,
             init_advance_iters=64, cull="brick", fine="row", adv="dist"),  # v14 winner ref
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=32,
             init_advance_iters=64, cull="brick", fine="row", adv="dist",
             flush_every=2),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=32,
             init_advance_iters=64, cull="brick", fine="row", adv="dist",
             flush_every=3),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=32,
             init_advance_iters=64, cull="brick", fine="brick", adv="dist",
             fine_heads=8, flush_every=2),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=32,
             init_advance_iters=64, cull="brick", fine="brick", adv="dist",
             fine_heads=12, flush_every=2),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=64, cull="brick", fine="row", adv="dist",
             flush_every=2),  # 4 jumps/round
        dict(candidates=128, evals=24, step_scale=4.0, advance_iters=32,
             init_advance_iters=64, cull="brick", fine="row", adv="dist",
             cull_heads=24, flush_every=2),  # long chains
        dict(candidates=128, evals=32, step_scale=4.0, advance_iters=32,
             init_advance_iters=64, cull="brick", fine="row", adv="dist",
             cull_heads=32, flush_every=2),
        # no-cull limit: evals >= candidates skips the probe stage wholly;
        # dist jumps carry all empty-space skipping
        dict(candidates=16, evals=16, step_scale=4.0, advance_iters=32,
             init_advance_iters=64, adv="dist", flush_every=2),
        dict(candidates=24, evals=24, step_scale=4.0, advance_iters=32,
             init_advance_iters=64, adv="dist", flush_every=2),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=32,
             init_advance_iters=64, cull="brick", fine="row", adv="dist",
             tile=1 << 17, flush_every=2),
    ],
    # scout-vs-DDA per-round advance A/B at the brick/row winner
    "adv": [
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "dda"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "scout"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=8,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "scout"}),
        dict(candidates=64, evals=16, step_scale=4.0, advance_iters=24,
             init_advance_iters=32,
             env={"SIENERF_CULL": "brick", "SIENERF_FINE": "row",
                  "SIENERF_ADV": "scout"}),
    ],
    # quick 3-config set for flag A/Bs:
    # reference-quality, r2-best, and the lean-round variant
    "best": [
        dict(candidates=64, evals=32, step_scale=2.0, advance_iters=16),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=16),
        dict(candidates=64, evals=32, step_scale=4.0, advance_iters=0, flush_every=2),
    ],
}


def main():
    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.ops.optim import inference_params

    cfgs = CONFIG_SETS[sys.argv[1] if len(sys.argv) > 1 else "v3"]
    R = int(os.environ.get("BAKE_R", "256"))
    ref_npy = os.environ.get("REF_NPY", "")

    eng, state = get_state()
    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]
    t0 = time.time()
    grid, meta = eng.bake_features(
        params, state["occ"], resolution=R,
        mode=os.environ.get("BAKE_MODE", "nearest"),
    )
    float(jnp.asarray(grid["rows"][0, 0]))
    bits_frac = float(jnp.mean(jnp.float32(jnp.unpackbits(
        jnp.asarray(np.frombuffer(np.asarray(grid["bits"]).tobytes(), np.uint8))))))
    print(f"# bake R={R} {time.time()-t0:.0f}s, live-bit fraction {bits_frac:.3f}")

    cam = eng.xforms[0]
    focal = tuple(np.asarray(eng.focals[0]) * W / eng.resolution[0])
    sc = tuple(np.asarray(eng.principal_points[0]))

    ref = None
    if ref_npy and Path(ref_npy).exists():
        ref = np.load(ref_npy)
        print(f"# ref loaded from {ref_npy}")
    import jax

    for ci, cfg in enumerate(cfgs):
        cfg = dict(cfg)
        env = cfg.pop("env", None)
        if env:
            os.environ.update({k: str(v) for k, v in env.items()})
            jax.clear_caches()  # knobs are read at trace time

        def run():
            return render_frame_baked(
                eng, params, bitfield, grid, cam, focal, width=W, height=H,
                resolution=meta["resolution"], mode=meta["mode"],
                n_cascades=meta["n_cascades"], screen_center=sc,
                return_stats=True, **cfg,
            )

        rgba, _, st = run()
        float(jnp.asarray(rgba[0, 0, 0]))  # compile+sync
        t0 = time.time()
        n = 2
        for _ in range(n):
            rgba, _, st = run()
        float(jnp.asarray(rgba[0, 0, 0]))
        dt = (time.time() - t0) / n
        st = np.asarray(st)
        img = np.asarray(rgba)[..., :3]
        if ref is None:
            ref = img
            if ref_npy:
                np.save(ref_npy, ref)
                print(f"# ref saved to {ref_npy}")
            psnr = float("inf")
        else:
            mse = float(np.mean((img - ref) ** 2))
            psnr = -10 * np.log10(max(mse, 1e-10))
        tag = " ".join(f"{k}={v}" for k, v in cfg.items())
        if env:
            tag += " " + ",".join(f"{k.replace('SIENERF_', '')}={v}" for k, v in env.items())
        print(
            f"{tag:70s} {dt*1e3:7.1f} ms  {W*H/dt/1e6:5.2f} Mr/s  "
            f"rounds={st[0]:4d} rayrounds={st[1]/1e6:5.1f}M evals={st[2]/1e6:6.1f}M "
            f"ovf={st[3]/1e6:4.1f}M  psnr_vs_ref={psnr:5.1f}"
        )


if __name__ == "__main__":
    main()

"""Decompose the baked-vs-live PSNR gap on the converged field.

bench (campaign3): baked-vs-live 27.1-27.35 dB on the rebuilt fox_16k
(train-view live PSNR 37.1) — below the 30 dB gate, so bench fell back to
the live renderer.  The older, foggier fox_16k measured 33.8 dB: bake error
tracks field sharpness.  Candidate error sources:

  (a) int8 feature quantization          -> A/B: int16 rows (--dtype)
  (b) R=256 nearest-vertex spatial quant -> A/B: BAKE_R=320/384
  (c) ss=4 candidate sampling vs live cone march -> A/B: ss ladder at no-cull
  (d) live-bit cull threshold            -> A/B: no-cull vs culled at same ss

Runs at 640x360 (bench's own gate resolution).  Usage:
  FOX_CACHE=fox_16k.pkl [BAKE_R=256] python tools/diag_bake_fidelity.py
"""

import os
import sys
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402

W, H = 640, 360


def main():
    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.ops.optim import inference_params

    R = int(os.environ.get("BAKE_R", "256"))
    RB = int(os.environ.get("BAKE_BITS", "8"))
    MODE = os.environ.get("BAKE_MODE", "nearest")
    eng, state = get_state()
    params = inference_params(state["opt"], state["params"])
    bf = state["occ"]["bitfield"]
    t0 = time.time()
    grid, meta = eng.bake_features(params, state["occ"], resolution=R,
                                   mode=MODE, row_bits=RB)
    float(jnp.asarray(grid["rows"][0, 0]))
    print(f"# bake R={R} bits={RB} mode={MODE}: {time.time() - t0:.0f}s")

    cam = eng.xforms[0]
    # FOCAL=native reproduces bench.py's gate view exactly (native focal
    # scaled to the gate resolution, centered) — 1.5x more zoomed than the
    # dataset-resolution view, where bake error reads ~3 dB harsher
    if os.environ.get("FOCAL", "diag") == "native":
        focal = tuple(np.asarray(eng.focals[0]) * 4.0 * W / 1280)
        sc = (0.5, 0.5)
    else:
        focal = tuple(np.asarray(eng.focals[0]) * W / eng.resolution[0])
        sc = tuple(np.asarray(eng.principal_points[0]))

    live, _ = eng.render_frame(params, bf, W, H, cam, focal, tile=1 << 14,
                               screen_center=sc)
    live = np.asarray(live[..., :3])

    CONFIGS = [
        ("ss4 ev16 brick/row (prod)", dict(candidates=64, evals=16, step_scale=4.0,
                                           advance_iters=16, init_advance_iters=32,
                                           cull="brick", fine="row")),
        ("ss4 no-cull", dict(candidates=64, evals=64, step_scale=4.0,
                             advance_iters=16, init_advance_iters=32)),
        ("ss2 no-cull", dict(candidates=64, evals=64, step_scale=2.0,
                             advance_iters=16, init_advance_iters=32)),
        ("ss1 no-cull", dict(candidates=96, evals=96, step_scale=1.0,
                             advance_iters=16, init_advance_iters=32,
                             max_rounds=48)),
    ]
    for name, cfg in CONFIGS:
        rgba, _ = render_frame_baked(
            eng, params, bf, grid, cam, focal, width=W, height=H,
            resolution=meta["resolution"], mode=meta["mode"],
            n_cascades=meta["n_cascades"], screen_center=sc, **cfg,
        )
        img = np.asarray(rgba[..., :3])
        mse = float(np.mean((live - img) ** 2))
        psnr = -10 * np.log10(max(mse, 1e-10))

        # 2x2-downsampled comparison: if the cross-PSNR jumps several dB,
        # the gap is pixel-scale sampling decorrelation (both renders are
        # valid but differently-phased samplings of sub-voxel fur detail),
        # not bake infidelity
        def ds2(x):
            return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2])

        mse2 = float(np.mean((ds2(live) - ds2(img)) ** 2))
        psnr2 = -10 * np.log10(max(mse2, 1e-10))
        print(f"{name:28s} vs live: {psnr:6.2f} dB   (2x2-downsampled: {psnr2:6.2f})")


if __name__ == "__main__":
    main()

"""Render-speed sweep on real TPU: tile size x chunk x march-iters x table
packing.  Each config gets a FRESH engine instance (the render jits key on
engine identity, so mutating knobs in place would silently reuse stale
compiled code).

Usage: FOX_CACHE=fox_prof.pkl python tools/sweep_render.py [quick]
"""

import dataclasses
import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402


def run_config(eng0, state, name, tile, psnr_too=False, **knobs):
    from sienerf_tpu.metrics import psnr as psnr_of
    from sienerf_tpu.ops.optim import inference_params

    eng = dataclasses.replace(eng0, **knobs)
    eng._phase = getattr(eng0, "_phase", "fast")
    if getattr(eng0, "_mean_samples", None):
        eng._mean_samples = eng0._mean_samples
    params = inference_params(state["opt"], state["params"])
    bf = state["occ"]["bitfield"]
    W, H = 1280, 720
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)
    cam = eng.xforms[0]

    t0 = time.time()
    rgba, depth = eng.render_frame(params, bf, W, H, cam, fl, tile=tile)
    np.asarray(rgba)
    t_compile = time.time() - t0

    n_frames = 3
    t0 = time.time()
    for _ in range(n_frames):
        rgba, depth = eng.render_frame(params, bf, W, H, cam, fl, tile=tile)
    np.asarray(rgba[0, 0])
    dt = (time.time() - t0) / n_frames
    line = (f"{name:34s} tile=2^{int(np.log2(tile)):2d} "
            f"{dt*1e3:7.1f} ms/frame  {W*H/dt/1e3:7.0f} krays/s  "
            f"(compile+1st {t_compile:.0f}s)")
    if psnr_too:
        w_ds, h_ds = eng.resolution
        rgba_q, _ = eng.render_frame(
            params, bf, w_ds, h_ds, eng.xforms[0], tuple(np.asarray(eng.focals[0])),
            screen_center=tuple(np.asarray(eng.principal_points[0])),
        )
        q = psnr_of(np.asarray(rgba_q[..., :3]), np.asarray(eng.images[0][..., :3]))
        line += f"  train-view PSNR {q:.2f}"
    print(line, flush=True)
    return dt


def main():
    eng, state = get_state()
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"

    run_config(eng, state, "baseline bf16 c16 m3.0", 1 << 14, psnr_too=True)
    run_config(eng, state, "bf16 c16 m3.0", 1 << 15)
    run_config(eng, state, "fp8 c16 m3.0", 1 << 15, psnr_too=True,
               render_table_pack="fp8")
    if quick:
        return
    run_config(eng, state, "fp8 c16 m1.5", 1 << 15,
               render_table_pack="fp8", render_march_iters_mult=1.5)
    run_config(eng, state, "fp8 c32 m1.5", 1 << 15,
               render_table_pack="fp8", render_chunk=32,
               render_march_iters_mult=1.5, render_max_chunks=48)
    run_config(eng, state, "fp8 c32 m1.5 big", 1 << 16,
               render_table_pack="fp8", render_chunk=32,
               render_march_iters_mult=1.5, render_max_chunks=48)


if __name__ == "__main__":
    main()

"""Measure the baked fine occupancy grid: bake time, occupancy stats,
frame time and PSNR with/without, at factors 2 and 4.

Usage: FOX_CACHE=fox_prof.pkl python tools/sweep_fine.py [factor ...]
"""

import dataclasses
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402


def frame_time(eng, params, bf, fine, tile=1 << 15, label=""):
    from sienerf_tpu.metrics import psnr as psnr_of

    W, H = 1280, 720
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)
    cam = eng.xforms[0]
    t0 = time.time()
    rgba, _ = eng.render_frame(params, bf, W, H, cam, fl, tile=tile, fine_bitfield=fine)
    np.asarray(rgba)
    t_c = time.time() - t0
    t0 = time.time()
    n_frames = 3
    for _ in range(n_frames):
        rgba, _ = eng.render_frame(params, bf, W, H, cam, fl, tile=tile, fine_bitfield=fine)
    np.asarray(rgba[0, 0])
    dt = (time.time() - t0) / n_frames
    w_ds, h_ds = eng.resolution
    rgba_q, _ = eng.render_frame(
        params, bf, w_ds, h_ds, eng.xforms[0], tuple(np.asarray(eng.focals[0])),
        screen_center=tuple(np.asarray(eng.principal_points[0])), fine_bitfield=fine,
    )
    q = psnr_of(np.asarray(rgba_q[..., :3]), np.asarray(eng.images[0][..., :3]))
    print(f"{label:28s} {dt*1e3:7.1f} ms/frame {W*H/dt/1e3:7.0f} krays/s  "
          f"PSNR {q:.2f} (compile {t_c:.0f}s)", flush=True)


def main():
    eng0, state = get_state()
    factors = [int(a) for a in sys.argv[1:]] or [2, 4]
    from sienerf_tpu.ops.optim import inference_params

    eng = dataclasses.replace(eng0, render_table_pack="fp8", render_march_iters_mult=1.5)
    eng._phase = "fast"
    params = inference_params(state["opt"], state["params"])
    bf = state["occ"]["bitfield"]
    coarse_frac = float(np.asarray(bf).mean())
    print(f"coarse occupancy: {coarse_frac:.4f} "
          f"({int(np.asarray(bf).sum())} cells)", flush=True)

    frame_time(eng, params, bf, None, label="no fine grid (fp8 m1.5)")
    for f in factors:
        t0 = time.time()
        fine = eng.bake_render_grid(params, state["occ"], factor=f)
        tb = time.time() - t0
        frac = float(np.asarray(fine).mean())
        print(f"factor {f}: bake {tb:.1f}s, fine occupancy {frac:.4f} "
              f"({frac/coarse_frac*100:.1f}% of coarse volume)", flush=True)
        eng_f = dataclasses.replace(eng)
        eng_f._phase = "fast"
        frame_time(eng_f, params, bf, fine, label=f"fine x{f} (fp8 m1.5)")


if __name__ == "__main__":
    main()

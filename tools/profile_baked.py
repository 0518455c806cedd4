"""Baked renderer on real TPU: bake time, frame time, rays/s, PSNR vs live.

Usage: python tools/profile_baked.py [R] [mode] [candidates] [step_scale]
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402

W, H = 1280, 720


def time_frames(fn, n=3, warmup=1):
    for _ in range(warmup):
        r = fn()
    float(jnp.asarray(r[0][0, 0, 0]))  # scalar fetch sync (tunnel-safe)
    t0 = time.time()
    for _ in range(n):
        r = fn()
    float(jnp.asarray(r[0][0, 0, 0]))
    return (time.time() - t0) / n, r


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mode = sys.argv[2] if len(sys.argv) > 2 else "trilinear"
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    ss = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0

    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.ops.optim import inference_params

    eng, state = get_state()
    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]

    t0 = time.time()
    grid, meta = eng.bake_features(params, state["occ"], resolution=R, mode=mode)
    float(jnp.asarray(grid["rows"][0, 0]))
    print(f"# bake R={R} mode={mode}: {time.time()-t0:.1f}s rows={grid['rows'].shape} "
          f"({grid['rows'].size*4/1e9:.2f} GB)")

    cam = eng.xforms[0]
    focal = tuple(np.asarray(eng.focals[0]) * W / eng.resolution[0])
    sc = tuple(np.asarray(eng.principal_points[0]))

    evals = int(sys.argv[5]) if len(sys.argv) > 5 else 32

    def baked():
        return render_frame_baked(
            eng, params, bitfield, grid, cam, focal, width=W, height=H,
            resolution=meta["resolution"], mode=meta["mode"],
            n_cascades=meta["n_cascades"],
            candidates=P, evals=evals, step_scale=ss, screen_center=sc,
        )

    dt, (rgba_b, _) = time_frames(baked)
    rays = W * H / dt
    print(f"baked  R={R} {mode} P={P} ss={ss}: {dt*1e3:8.1f} ms/frame  "
          f"{rays/1e6:6.2f} M rays/s")

    if "--live" in sys.argv:
        def live():
            return eng.render_frame(params, bitfield, W, H, cam, focal, screen_center=sc)

        dtl, (rgba_l, _) = time_frames(live, n=1)
        print(f"live: {dtl*1e3:8.1f} ms/frame  {W*H/dtl/1e6:6.3f} M rays/s")
        a = np.asarray(rgba_l)[..., :3]
        b = np.asarray(rgba_b)[..., :3]
        mse = float(np.mean((a - b) ** 2))
        print(f"baked-vs-live PSNR: {-10*np.log10(max(mse,1e-10)):.2f} dB")


if __name__ == "__main__":
    main()

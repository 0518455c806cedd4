"""TPU A/B of the sweep composite's group-batching knob (VERDICT r4 #1a).

Loads the committed render snapshot + cached bake ONCE, then times the
720p slab-sweep frame at G in {1, 2, 4, 8} (and any extra knobs passed via
env).  Loop-amortized, varied pixel_offset per rep (tunnel measurement
discipline, NOTES_ROUND4).

Usage: [W=1280 H=720 REPS=4 GROUPS=1,2,4,8] python tools/ab_sweep_group.py
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax.numpy as jnp

    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.engines.nerf_sweep import render_frame_sweep
    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
    from sienerf_tpu.io.snapshot import load_render_snapshot
    from sienerf_tpu.utils.config import load_network_config

    W = int(os.environ.get("W", "1280"))
    H = int(os.environ.get("H", "720"))
    reps = int(os.environ.get("REPS", "4"))
    groups = [int(g) for g in os.environ.get("GROUPS", "1,2,4,8").split(",")]

    ds = load_nerf_dataset("/root/reference/data/nerf/fox", downscale=4,
                           max_images=24)
    cfg = load_network_config("/root/reference/configs/nerf/base.json")
    eng = NerfEngine.create(cfg, ds, train_batch_size=1 << 18)
    params, bitfield, smeta = load_render_snapshot(
        Path(__file__).resolve().parent.parent / "data" / "fox_render.snap")
    blob = np.load(".cache/bake_256_16.npz")
    meta = {"resolution": int(blob["resolution"]), "mode": "nearest",
            "n_cascades": int(blob["n_cascades"])}
    grid = {k: jnp.asarray(blob[k]) for k in blob.files
            if k not in ("resolution", "n_cascades")}

    cam = eng.xforms[0]
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)
    sc = tuple(np.asarray(eng.principal_points[0]))

    ref = None
    for g in groups:
        def frame(off):
            return render_frame_sweep(
                eng, params, grid, meta, cam, fl, width=W, height=H,
                screen_center=sc, pixel_offset=jnp.asarray(off, jnp.float32),
                group=g,
            )

        r = frame((0.5, 0.5))
        np.asarray(r[0][0, 0])  # compile + sync
        t0 = time.time()
        for i in range(reps):
            r = frame((0.5, 0.5 + 1e-6 * (i + 1)))
        out = np.asarray(r[0])
        dt = (time.time() - t0) / reps
        line = f"G={g:2d}  {dt*1e3:8.1f} ms/frame  {W*H/dt/1e6:6.2f} Mrays/s"
        if ref is None:
            ref = out
        else:
            mse = float(np.mean((out - ref) ** 2))
            line += f"  vs-G1 mse {mse:.3e}"
        print(line, flush=True)


if __name__ == "__main__":
    main()

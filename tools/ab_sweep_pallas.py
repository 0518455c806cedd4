"""TPU A/B: fused Pallas sweep composite vs the XLA scan composite on the
real 720p fox frame (VERDICT r4 #1 — the roofline push).

Loads the committed render snapshot + cached bake once, then times
render_frame_sweep with impl in {xla, pallas} (and optional block_rows
variants via SWEEP_BT), loop-amortized with per-rep pixel offsets.
Reports frame ms, Mrays/s, and pallas-vs-xla PSNR (should be ~lossless).

Usage: [W=1280 H=720 REPS=4 IMPLS=xla,pallas] python tools/ab_sweep_pallas.py
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-10))


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
    impls = os.environ.get("IMPLS", "xla,pallas").split(",")

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

    cam = jnp.asarray(eng.xforms[0])  # pre-upload: a per-call numpy arg
    # costs a fresh host->device transfer (a tunnel RTT) every frame
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)
    sc = tuple(np.asarray(eng.principal_points[0]))

    ref = None
    for impl in impls:
        def frame(off, ph=None):
            return render_frame_sweep(
                eng, params, grid, meta, cam, fl, width=W, height=H,
                screen_center=sc, pixel_offset=jnp.asarray(off, jnp.float32),
                impl=impl, axis_phase=ph, packed=True,
            )

        r = frame((0.5, 0.5))
        np.asarray(r[0, 0])  # compile + sync through the tunnel
        t0 = time.time()
        for i in range(reps):
            r = frame((0.5, 0.5 + 1e-6 * (i + 1)))
        out = np.moveaxis(np.asarray(r), 0, -1)[..., :4]
        dt = (time.time() - t0) / reps
        line = (f"{impl:8s} {dt*1e3:8.1f} ms/frame  "
                f"{W*H/dt/1e6:6.2f} Mrays/s")
        if ref is None:
            ref = out
        else:
            line += f"  vs-{impls[0]} PSNR {psnr(out, ref):.2f} dB"
        print(line, flush=True)

        if impl == "pallas" and os.environ.get("PHASE_AB"):
            # phase-jitter cost (second slab stream)
            r = frame((0.5, 0.5), ph=jnp.float32(0.25))
            np.asarray(r[0, 0])
            t0 = time.time()
            for i in range(reps):
                r = frame((0.5, 0.5 + 1e-6 * (i + 1)), ph=jnp.float32(0.25))
            np.asarray(r[0, 0])
            dt = (time.time() - t0) / reps
            print(f"{'pallas+ph':8s} {dt*1e3:8.1f} ms/frame  "
                  f"{W*H/dt/1e6:6.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()

"""Drive + time the slab-sweep renderer on the real fox field (TPU).

Renders the bench view (720p, native focal) three ways — slab-sweep,
gather-baked winner config, live streaming — times the first two
(loop-amortized, varied pixel_offset per rep so the jit cache can't serve
stale results), and reports cross-PSNRs.  The sweep renderer must land
within the same novel-view-parity family as the gather renderer before it
may become the bench headline (tools/eval_baked_parity.py --renderer sweep
is the gate evidence; this is the perf + smoke drive).

Usage: [W=1280 H=720] [SWEEP_ONLY=1] python tools/bench_sweep.py
"""

import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32) - np.asarray(b, np.float32)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-10))


def main():
    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.engines.nerf_sweep import render_frame_sweep

    from tools.profile_render import get_baked

    W = int(os.environ.get("W", "1280"))
    H = int(os.environ.get("H", "720"))
    unroll = int(os.environ.get("SWEEP_UNROLL", "1"))
    group = int(os.environ.get("SWEEP_GROUP", "1"))
    margin = float(os.environ.get("SWEEP_MARGIN", "1.15"))
    if os.environ.get("BENCH_SNAP"):
        # fast-load perf mode: committed 93 MB render snapshot for params
        # (~1 min) + the cached bake — NOTE the cached bake may be from a
        # DIFFERENT field than the snapshot params, which is fine for
        # timing (sweep cost is content-independent) but NOT for PSNR:
        # use with SWEEP_ONLY=1
        from pathlib import Path as _P

        import jax

        from sienerf_tpu.engines.nerf import NerfEngine
        from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
        from sienerf_tpu.io.snapshot import load_render_snapshot
        from sienerf_tpu.utils.config import load_network_config

        ds = load_nerf_dataset("/root/reference/data/nerf/fox", downscale=4,
                               max_images=24)
        cfg = load_network_config("/root/reference/configs/nerf/base.json")
        eng = NerfEngine.create(cfg, ds, train_batch_size=1 << 18)
        params, bitfield, smeta = load_render_snapshot(
            _P(__file__).resolve().parent.parent / "data" / "fox_render.snap")
        state = {"opt": {}, "params": params, "occ": {"bitfield": bitfield}}
        blob = np.load(".cache/bake_256_16.npz")
        meta = {"resolution": int(blob["resolution"]), "mode": "nearest",
                "n_cascades": int(blob["n_cascades"])}
        import jax.numpy as _jnp

        grid = {k: _jnp.asarray(blob[k]) for k in blob.files
                if k not in ("resolution", "n_cascades")}
        print("# BENCH_SNAP fast-load (snapshot params + cached bake)")
    else:
        eng, state = get_state()
        bitfield = state["occ"]["bitfield"]
        grid, meta, params = get_baked(eng, state)

    cam = eng.xforms[0]
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)  # native focal at 720p
    sc = tuple(np.asarray(eng.principal_points[0]))

    def sweep(off):
        return render_frame_sweep(
            eng, params, grid, meta, cam, fl, width=W, height=H,
            screen_center=sc, pixel_offset=jnp.asarray(off, jnp.float32),
            unroll=unroll, margin=margin, group=group,
        )

    def timeit(name, fn, n=4):
        r = fn((0.5, 0.5))
        np.asarray(r[0][0, 0])  # compile + sync through the tunnel
        t0 = time.time()
        for i in range(n):
            r = fn((0.5, 0.5 + 1e-6 * (i + 1)))
        out = np.asarray(r[0])
        dt = (time.time() - t0) / n
        print(f"{name:18s} {dt*1e3:8.1f} ms/frame  {W*H/dt/1e6:6.2f} Mrays/s",
              flush=True)
        return out, dt

    img_sweep, dt_sweep = timeit("sweep", sweep)

    if os.environ.get("SWEEP_ONLY"):
        return

    BAKED = dict(candidates=64, evals=16, step_scale=4.0, advance_iters=32,
                 init_advance_iters=64, cull="brick", fine="row", adv="dist")

    def baked(off):
        return render_frame_baked(
            eng, params, bitfield, grid, cam, fl, width=W, height=H,
            resolution=meta["resolution"], mode=meta["mode"],
            n_cascades=meta["n_cascades"], screen_center=sc,
            pixel_offset=jnp.asarray(off, jnp.float32), **BAKED,
        )

    img_baked, dt_baked = timeit("baked(gather)", baked, n=2)
    print(f"sweep-vs-baked PSNR: {psnr(img_sweep[..., :3], img_baked[..., :3]):.2f} dB")

    t0 = time.time()
    live, _ = eng.render_frame(params, bitfield, W, H, cam, fl,
                               screen_center=sc)
    live = np.asarray(live)
    print(f"live               {(time.time()-t0)*1e3:8.1f} ms/frame (1 rep, compile incl.)")
    print(f"sweep-vs-live PSNR: {psnr(img_sweep[..., :3], live[..., :3]):.2f} dB")
    print(f"baked-vs-live PSNR: {psnr(img_baked[..., :3], live[..., :3]):.2f} dB")
    np.save("/tmp/sweep720.npy", img_sweep)
    np.save("/tmp/baked720.npy", img_baked)
    np.save("/tmp/live720.npy", live)


if __name__ == "__main__":
    main()

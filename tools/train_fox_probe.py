"""Train fox from scratch and watch the signals that matter: occupancy
carving, samples/ray, step time, then render throughput + PSNR.

Usage: python tools/train_fox_probe.py [n_bundles] [--save cache_name]
"""

import pickle
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CACHE = Path(__file__).resolve().parent.parent / ".cache"


def main():
    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.utils.config import load_network_config

    n_bundles = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    save = None
    if "--save" in sys.argv:
        save = sys.argv[sys.argv.index("--save") + 1]

    ds = load_nerf_dataset("/root/reference/data/nerf/fox", downscale=4, max_images=24)
    cfg = load_network_config("/root/reference/configs/nerf/base.json")
    eng = NerfEngine.create(cfg, ds, train_batch_size=1 << 18)
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    t_start = time.time()
    for i in range(n_bundles):
        key, sub = jax.random.split(key)
        t0 = time.time()
        state, loss, cnt = eng.train_bundle(state, sub)
        loss = float(loss)
        if i < 4 or (i + 1) % 8 == 0:
            occ = float(jnp.mean(state["occ"]["bitfield"].astype(jnp.float32)))
            geom = eng._phase_geometry()
            print(
                f"bundle {i+1:3d} (step {(i+1)*eng.grid_interval:5d}): "
                f"loss={loss:.4f} samples/ray={float(cnt):6.1f} occ={occ:.3f} "
                f"next(n_rays,k,iters)={geom} {time.time()-t0:.1f}s"
            )
    print(f"# total train {time.time()-t_start:.0f}s")

    params = inference_params(state["opt"], state["params"])
    bf = state["occ"]["bitfield"]
    W, H = 1280, 720
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)
    cam = eng.xforms[0]
    rgba, depth = eng.render_frame(params, bf, W, H, cam, fl, tile=1 << 15)
    np.asarray(rgba)
    t0 = time.time()
    for _ in range(3):
        rgba, depth = eng.render_frame(params, bf, W, H, cam, fl, tile=1 << 15)
    np.asarray(rgba)
    dt = (time.time() - t0) / 3
    print(f"render 720p: {dt*1e3:.0f} ms -> {W*H/dt/1e6:.3f} Mrays/s "
          f"(opacity {float(rgba[...,3].mean()):.3f})")

    psnr, per = eng.eval_psnr(state, [0, 5, 10])
    print(f"train-view PSNR: {psnr:.2f} {['%.1f' % p for p in per]}")

    if save:
        CACHE.mkdir(exist_ok=True)
        with open(CACHE / save, "wb") as fh:
            pickle.dump(
                {"state": jax.tree.map(np.asarray, state),
                 "phase": getattr(eng, "_phase", "fast"),
                 "mean_samples": getattr(eng, "_mean_samples", None)},
                fh,
            )
        print(f"# saved {save}")


if __name__ == "__main__":
    main()

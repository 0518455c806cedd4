"""Rebuild .cache/bake_256_16.npz from the committed render snapshot.

Fresh boxes lose the bake cache; every perf tool (bench_sweep,
ab_sweep_pallas, profile_sweep_split) loads it via BENCH_SNAP.  This
reconstructs it exactly the way bench.py does: load data/fox_render.snap
(fp8/fp16 inference params + occupancy bitfield), bake the R=256 int16
nearest-mode feature grid, save the npz in profile_render.get_baked's
format.  ~6 min of TPU through the tunnel.
"""

import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CACHE = Path(__file__).resolve().parent.parent / ".cache"
CACHE.mkdir(exist_ok=True)


def main():
    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
    from sienerf_tpu.io.snapshot import load_render_snapshot
    from sienerf_tpu.utils.config import load_network_config

    ds = load_nerf_dataset("/root/reference/data/nerf/fox", downscale=4,
                           max_images=24)
    cfg = load_network_config("/root/reference/configs/nerf/base.json")
    eng = NerfEngine.create(cfg, ds, train_batch_size=1 << 18)
    params, bitfield, smeta = load_render_snapshot(
        Path(__file__).resolve().parent.parent / "data" / "fox_render.snap")
    eng._phase = smeta.get("phase", "fast")
    if smeta.get("mean_samples"):
        eng._mean_samples = float(smeta["mean_samples"])
    print(f"# snapshot step {smeta['step']}", flush=True)

    t0 = time.time()
    grid, meta = eng.bake_features(params, {"bitfield": bitfield},
                                   resolution=256, mode="nearest",
                                   row_bits=16)
    jax.block_until_ready(grid["rows"])
    print(f"# bake R=256 int16: {time.time()-t0:.0f}s", flush=True)
    save = {k: np.asarray(v) for k, v in grid.items() if k != "brows"}
    save["resolution"] = np.int32(meta["resolution"])
    save["n_cascades"] = np.int32(meta["n_cascades"])
    f = CACHE / "bake_256_16.npz"
    tmp = f.with_suffix(".tmp.npz")
    np.savez(tmp, **save)
    tmp.rename(f)
    print(f"# wrote {f} ({f.stat().st_size/1e9:.2f} GB)", flush=True)


if __name__ == "__main__":
    main()

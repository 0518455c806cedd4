"""Continue fox training from a cached state; track occupancy + render time.

Usage: python tools/train_fox_more.py <cache_in> <n_bundles> [cache_out]
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
    from tools.profile_render import get_state
    from sienerf_tpu.ops.optim import inference_params

    cache_in = sys.argv[1]
    n_bundles = int(sys.argv[2])
    cache_out = sys.argv[3] if len(sys.argv) > 3 else None

    eng, state = get_state(cache_name=cache_in)
    key = jax.random.PRNGKey(int(state["step"]))
    t_start = time.time()
    for i in range(n_bundles):
        key, sub = jax.random.split(key)
        state, loss, cnt = eng.train_bundle(state, sub)
        if (i + 1) % 32 == 0:
            occ = float(jnp.mean(state["occ"]["bitfield"].astype(jnp.float32)))
            print(
                f"step {int(state['step']):5d}: loss={float(loss):.4f} "
                f"samples/ray={float(cnt):6.1f} occ={occ:.3f} "
                f"geom={eng._phase_geometry()}",
                flush=True,
            )
    print(f"# train {time.time()-t_start:.0f}s")

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

    if cache_out:
        # atomic write: a killed run must not leave a truncated cache that
        # poisons later consumers (bench.py falls back, but don't rely on it)
        tmp = CACHE / (cache_out + ".tmp")
        # record the exact training image set (ADVICE r3: the bench gate
        # filters held-out views against it instead of assuming the
        # first-24 protocol)
        from sienerf_tpu.io.nerf_dataset import load_nerf_dataset

        train_names = [
            Path(p).name
            for p in load_nerf_dataset(
                "/root/reference/data/nerf/fox", downscale=4, max_images=24
            ).paths
        ]
        with open(tmp, "wb") as fh:
            pickle.dump(
                {"state": jax.tree.map(np.asarray, state),
                 "phase": getattr(eng, "_phase", "fast"),
                 "mean_samples": getattr(eng, "_mean_samples", None),
                 "train_paths": train_names},
                fh,
            )
        tmp.replace(CACHE / cache_out)
        print(f"# saved {cache_out}")


if __name__ == "__main__":
    main()

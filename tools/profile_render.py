"""Render-path profiling on real TPU: where does frame time go?

Trains fox briefly (cached to .cache/fox_prof.pkl), then times:
  - march_rays alone (DDA through bitfield)
  - _eval_samples alone (hash encode + MLPs) at the same shapes
  - composite alone
  - full render_frame at 720p
Timings are loop-amortized with host transfers (tunnel-safe, see
NOTES_ROUND1.md).
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
CACHE.mkdir(exist_ok=True)


def get_state(n_bundles=48, cache_name=None):
    import os

    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
    from sienerf_tpu.utils.config import load_network_config

    ds = load_nerf_dataset("/root/reference/data/nerf/fox", downscale=4, max_images=24)
    cfg = load_network_config("/root/reference/configs/nerf/base.json")
    eng = NerfEngine.create(cfg, ds, train_batch_size=1 << 18)
    f = CACHE / (cache_name or os.environ.get("FOX_CACHE", "fox_prof.pkl"))
    if f.exists():
        with open(f, "rb") as fh:
            blob = pickle.load(fh)
        state = jax.tree.map(jnp.asarray, blob["state"])
        eng._phase = blob["phase"]
        if blob.get("mean_samples"):
            eng._mean_samples = blob["mean_samples"]
        print(f"# loaded cached state {f.name} (step {int(state['step'])})")
    else:
        state = eng.init(0)
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        for i in range(n_bundles):
            key, sub = jax.random.split(key)
            state, loss, cnt = eng.train_bundle(state, sub)
        print(f"# trained {n_bundles} bundles in {time.time()-t0:.0f}s loss={float(loss):.4f}",
              flush=True)
        # atomic write; _phase/_mean_samples are lazily set by training
        # (engines/nerf.py _update_phase) — default like the engine does
        tmp = f.with_suffix(".tmp")
        with open(tmp, "wb") as fh:
            pickle.dump(
                {"state": jax.tree.map(np.asarray, state),
                 "phase": getattr(eng, "_phase", "deep"),
                 "mean_samples": getattr(eng, "_mean_samples", None)},
                fh,
            )
        tmp.replace(f)
    return eng, state


def get_baked(eng, state, resolution=256, row_bits=16, cache_name=None):
    """Bake (or load the cached bake of) the nearest-mode feature grid.

    The R=256 int16 bake costs ~6 min of TPU through the tunnel; perf
    iteration on the renderers shouldn't pay it per process.  Cached as an
    uncompressed npz next to the state cache (~1.7 GB, ~15 s load)."""
    import jax

    from sienerf_tpu.ops.optim import inference_params

    params = inference_params(state["opt"], state["params"])
    f = CACHE / (cache_name or f"bake_{resolution}_{row_bits}.npz")
    if f.exists():
        blob = np.load(f, allow_pickle=False)
        meta = {"resolution": int(blob["resolution"]),
                "mode": "nearest", "n_cascades": int(blob["n_cascades"])}
        grid = {k: jnp.asarray(blob[k]) for k in blob.files
                if k not in ("resolution", "n_cascades")}
        print(f"# loaded cached bake {f.name}")
        return grid, meta, params
    t0 = time.time()
    grid, meta = eng.bake_features(params, state["occ"], resolution=resolution,
                                   mode="nearest", row_bits=row_bits)
    jax.block_until_ready(grid["rows"])
    print(f"# bake R={resolution} int{row_bits}: {time.time()-t0:.0f}s",
          flush=True)
    save = {k: np.asarray(v) for k, v in grid.items() if k != "brows"}
    save["resolution"] = np.int32(meta["resolution"])
    save["n_cascades"] = np.int32(meta["n_cascades"])
    tmp = f.with_suffix(".tmp.npz")
    np.savez(tmp, **save)
    tmp.rename(f)
    grid.pop("brows", None)  # parity with the cached-load path
    return grid, meta, params


def timeit(fn, n=10, warmup=2):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    # host-transfer-synced timing (tunnel's block_until_ready returns early)
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    np.asarray(jax.tree.leaves(r)[0])
    return (time.time() - t0) / n


def main():
    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.ops.raymarch import march_rays, composite_chunk

    eng, state = get_state()
    params = inference_params(state["opt"], state["params"])
    bf = state["occ"]["bitfield"]
    print(f"# grid occupancy: {float(jnp.mean(bf.astype(jnp.float32))):.4f}")

    W, H = 1280, 720
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)
    cam = eng.xforms[0]

    # full frame
    def frame():
        return eng.render_frame(params, bf, W, H, cam, fl, tile=1 << 15)

    dt = timeit(frame, n=3)
    print(f"full render_frame 720p: {dt*1e3:.1f} ms -> {W*H/dt/1e6:.2f} Mrays/s")

    # pieces at tile shapes
    A = 1 << 15
    ids = jnp.arange(A, dtype=jnp.int32)
    px = (ids % W).astype(jnp.float32)
    py = (ids // W).astype(jnp.float32)
    uv = jnp.stack([(px + 0.5) / W, (py + 0.5) / H], axis=-1)
    from sienerf_tpu.utils.camera import uv_to_ray

    o, d = uv_to_ray(uv, (W, H), fl, cam)
    dnorm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d_n = d / dnorm
    t0_, t1_ = eng._aabb_times(o, d_n, 0.1)

    K = eng.render_chunk

    march_j = jax.jit(lambda bf, t: march_rays(eng.march, bf, o, d_n, t, t1_, K, K * 3))
    dt_march = timeit(lambda: march_j(bf, t0_))
    print(f"march_rays chunk (A={A}, K={K}): {dt_march*1e3:.2f} ms "
          f"-> {A*K/dt_march/1e6:.1f} Msamples/s")

    ts, dts, counts, t_end = march_j(bf, t0_)

    eval_j = jax.jit(lambda p, ts, dts, counts: eng._eval_samples(p, o, d_n, ts, dts, counts))
    dt_eval = timeit(lambda: eval_j(params, ts, dts, counts))
    print(f"eval_samples (A={A}, K={K}): {dt_eval*1e3:.2f} ms "
          f"-> {A*K/dt_eval/1e6:.1f} Msamples/s")

    rgb, dens, valid = eval_j(params, ts, dts, counts)
    comp_j = jax.jit(
        lambda rgb, dens: composite_chunk(rgb, dens, ts, dts, valid,
                                          jnp.ones((A,), jnp.float32), 1e-4)
    )
    dt_comp = timeit(lambda: comp_j(rgb, dens))
    print(f"composite chunk: {dt_comp*1e3:.2f} ms")

    # how many chunk rounds does the full frame actually do?
    # estimate: frame time / chunk time
    per_round = dt_march + dt_eval + dt_comp
    print(f"# per-round total {per_round*1e3:.2f} ms; frame/round = {dt/per_round:.0f} rounds")


if __name__ == "__main__":
    main()

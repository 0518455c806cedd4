"""Split-time the sweep frame's stages on TPU (round 5): prep (dense
per-vertex MLP shade) / orient+pad / composite (XLA vs Pallas) / warp.

Each stage is timed in its OWN jit with the big intermediate passed as an
ARGUMENT in an aligned layout (no minor-dim tile padding) and the output
reduced to a scalar (single fetch) — the NOTES_ROUND4 stage-profiler
gotcha (boundary materialization) does not apply to aligned shapes.

Usage: [REPS=3] python tools/profile_sweep_split.py
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.engines.nerf_sweep import _align, prepare_rgba_volume
    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
    from sienerf_tpu.io.snapshot import load_render_snapshot
    from sienerf_tpu.ops.sweep import orient_grid, sweep_composite
    from sienerf_tpu.ops.sweep_pallas import sweep_composite_pallas
    from sienerf_tpu.utils.config import load_network_config

    reps = int(os.environ.get("REPS", "3"))
    W, H = 1280, 720
    ds = load_nerf_dataset("/root/reference/data/nerf/fox", downscale=4,
                           max_images=24)
    cfg = load_network_config("/root/reference/configs/nerf/base.json")
    eng = NerfEngine.create(cfg, ds, train_batch_size=1 << 18)
    params, bitfield, smeta = load_render_snapshot(
        Path(__file__).resolve().parent.parent / "data" / "fox_render.snap")
    blob = np.load(".cache/bake_256_16.npz")
    R = int(blob["resolution"])
    K = int(blob["n_cascades"])
    grid = {k: jnp.asarray(blob[k]) for k in blob.files
            if k not in ("resolution", "n_cascades")}
    rows, scale = grid["rows"], grid["scale"]
    cam = np.asarray(eng.xforms[0])
    o0 = jnp.asarray(cam[:3, 3], jnp.float32)

    hi, wi = _align(1.15 * H), _align(1.15 * W)

    @jax.jit
    def prep_only(params, rows, scale, o):
        vol = prepare_rgba_volume(eng, params, rows, scale, o, R, K)
        return jnp.sum(vol.astype(jnp.float32))

    @jax.jit
    def prep_orient_pad(params, rows, scale, o):
        vol = prepare_rgba_volume(eng, params, rows, scale, o, R, K)
        oriented = orient_grid(vol, 0, False)
        padded = jnp.pad(oriented, ((0, 0), (0, 0), (0, 0),
                                    (0, 384 - (R + 1)), (0, 384 - (R + 1))))
        return jnp.sum(padded[:, ::37, :, ::37, ::37].astype(jnp.float32))

    def mk_inputs():
        # a real padded oriented volume (from one prep run)
        vol = prepare_rgba_volume(eng, params, rows, scale, o0, R, K)
        oriented = orient_grid(vol, 0, False)
        padded = jnp.pad(oriented, ((0, 0), (0, 0), (0, 0),
                                    (0, 384 - (R + 1)), (0, 384 - (R + 1))))
        unpadded = oriented
        slab_live = jnp.any(oriented[:, :, 3] > 0, axis=(2, 3))
        eb = jnp.linspace(-0.8, 0.9, hi)
        ec = jnp.linspace(-0.9, 0.8, wi)
        oc = jnp.asarray([-0.9, 0.45, 0.55], jnp.float32)
        return padded, unpadded, slab_live, oc, eb, ec

    padded, unpadded, slab_live, oc, eb, ec = jax.block_until_ready(
        mk_inputs())

    @jax.jit
    def comp_pallas(vol_unpadded, slab_live, oc, eb, ec, near):
        C, op, T, bt = sweep_composite_pallas(
            vol_unpadded, slab_live, oc, eb, ec, near, 1e-4,
            resolution=R, n_cascades=K)
        return jnp.sum(C) + jnp.sum(op) + jnp.sum(bt)

    @jax.jit
    def comp_xla(vol_unpadded, slab_live, oc, eb, ec, near):
        C, op, T, bt = sweep_composite(
            vol_unpadded, slab_live, oc, eb, ec, near, 1e-4,
            resolution=R, n_cascades=K)
        return jnp.sum(C) + jnp.sum(op) + jnp.sum(bt)

    def timeit(name, fn, *args, vary=None):
        r = fn(*args, 0.05)
        jax.block_until_ready(r)
        t0 = time.time()
        for i in range(reps):
            r = fn(*args, 0.05 + 1e-6 * (i + 1))
            jax.block_until_ready(r)
        print(f"{name:24s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)

    @jax.jit
    def prep_v(params, rows, scale, o, eps):
        return prep_only(params, rows, scale, o + eps)

    @jax.jit
    def prep_op_v(params, rows, scale, o, eps):
        return prep_orient_pad(params, rows, scale, o + eps)

    timeit("prep(MLP shade)", lambda e: prep_v(params, rows, scale, o0, e))
    timeit("prep+orient+pad", lambda e: prep_op_v(params, rows, scale, o0, e))
    timeit("composite pallas",
           lambda e: comp_pallas(unpadded, slab_live, oc, eb, ec, e))
    timeit("composite xla",
           lambda e: comp_xla(unpadded, slab_live, oc, eb, ec, e))


if __name__ == "__main__":
    main()

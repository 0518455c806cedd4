"""Stage timing of the slab-sweep renderer on real TPU.

Stages (each its own jit, loop-amortized with varied inputs, one fetch):
  prep      — prepare_rgba_volume (row decode + per-vertex MLP shade)
  orient    — transpose/flip + slab_live reduction
  composite — sweep_composite over the full slab schedule
  warp      — final projective warp (4-tap row gather)
  frame     — the whole render_frame_sweep (cross-check: sum of stages)

Usage: [W=1280 H=720] python tools/profile_sweep.py
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


def main():
    from sienerf_tpu.common import NERF_RENDERING_NEAR_DISTANCE
    from sienerf_tpu.engines import nerf_sweep as ns
    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.ops.sweep import orient_grid, sweep_composite, warp_to_pixels

    W = int(os.environ.get("W", "1280"))
    H = int(os.environ.get("H", "720"))
    eng, state = get_state()
    params = inference_params(state["opt"], state["params"])
    grid, meta = eng.bake_features(params, state["occ"], resolution=256,
                                   mode="nearest", row_bits=16)
    R, K = meta["resolution"], meta["n_cascades"]
    float(np.asarray(grid["rows"][0, 0]))
    print("# baked", flush=True)

    cam = eng.xforms[0]
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)
    sc = tuple(np.asarray(eng.principal_points[0]))
    n = W * H
    cam_spec = (W, H, fl, jnp.asarray(cam), sc, jnp.asarray([0.5, 0.5], jnp.float32))
    ids = jnp.arange(n, dtype=jnp.int32)
    o, d_n, dn, _, _ = jax.jit(
        lambda: eng._frame_make_rays(ids, n, cam_spec)
    )()
    o0 = np.asarray(o[0])
    axis, flip = 0, False  # fox view 0 is x-dominant; adjust if not
    from sienerf_tpu.utils.camera import uv_to_ray
    _, d0 = uv_to_ray(jnp.asarray([[0.5, 0.5]]), (W, H), fl, cam, sc, eng.lens)
    d0 = np.asarray(d0)[0]
    axis = int(np.argmax(np.abs(d0)))
    flip = bool(d0[axis] < 0)
    print(f"# axis={axis} flip={flip}")

    hi, wi = ns._align(1.15 * H), ns._align(1.15 * W)
    near = max(NERF_RENDERING_NEAR_DISTANCE, eng.near_distance)

    def timeit(name, fn, n_rep=3):
        r = fn(0)
        jax.block_until_ready(r)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        t0 = time.time()
        for i in range(n_rep):
            r = fn(i + 1)
        jax.block_until_ready(r)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        dt = (time.time() - t0) / n_rep
        print(f"{name:10s} {dt*1e3:8.1f} ms", flush=True)
        return r

    # rows/params/vol are jit ARGS, never closure captures: captured
    # device arrays become HLO constants (NOTES_ROUND1 #2) — a 1.6 GB
    # constant hangs the compiler outright (measured, this tool's v1)
    prep_jit = jax.jit(lambda p, rows, scale, co: ns.prepare_rgba_volume(
        eng, p, rows, scale, co, R, K))
    vol = timeit("prep", lambda i: prep_jit(
        params, grid["rows"], grid["scale"], jnp.asarray(o0 + 1e-6 * i)))

    orient_jit = jax.jit(lambda v: (
        orient_grid(v, axis, flip),
        jnp.any(orient_grid(v, axis, flip)[:, :, 3] > 0, axis=(2, 3)),
    ))
    oriented, slab_live = timeit("orient", lambda i: orient_jit(vol))

    d_c = ns.canon_coords(d_n, axis, flip, False)
    o_c = np.asarray(ns.canon_coords(jnp.asarray(o0), axis, flip, True))
    e_px = np.asarray(jnp.clip(d_c[:, 1:] / jnp.maximum(d_c[:, 0:1], 1e-3),
                               -ns.E_MAX, ns.E_MAX))
    elo, ehi = e_px.min(0), e_px.max(0)
    deb = (ehi[0] - elo[0]) / (hi - 2)
    dec = (ehi[1] - elo[1]) / (wi - 2)
    eb = jnp.asarray(elo[0] + (np.arange(hi) - 0.5) * deb, jnp.float32)
    ec = jnp.asarray(elo[1] + (np.arange(wi) - 0.5) * dec, jnp.float32)

    comp_jit = jax.jit(lambda og, sl, oc: sweep_composite(
        og, sl, oc, eb, ec, near, 1e-4, resolution=R, n_cascades=K))
    C, op, T, bt = timeit(
        "composite", lambda i: comp_jit(oriented, slab_live,
                                        jnp.asarray(o_c + 1e-7 * i)))

    maps = jnp.concatenate([C, op[..., None], bt[..., None]], axis=-1)
    e_px_j = jnp.asarray(e_px)
    warp_jit = jax.jit(lambda m, ep, s: warp_to_pixels(
        m + s, ep, eb[0], deb, ec[0], dec))
    timeit("warp", lambda i: warp_jit(maps, e_px_j, jnp.float32(i * 1e-9)))

    def frame(i):
        return ns.render_frame_sweep(
            eng, params, grid, meta, cam, fl, width=W, height=H,
            screen_center=sc,
            pixel_offset=jnp.asarray((0.5, 0.5 + 1e-6 * i), jnp.float32),
        )

    timeit("frame", frame)


if __name__ == "__main__":
    main()

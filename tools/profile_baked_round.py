"""Stage-by-stage timing of one _baked_round on real TPU.

Each stage is timed cumulatively (chain, +cull, +compact, +fine-gather,
+colors, +composite, +flush) by jitting progressively larger prefixes, all
loop-amortized inside one jit (tunnel-safe).

Usage: FOX_CACHE=fox_4k.pkl python tools/profile_baked_round.py [P] [evals]
"""

import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402

W, H = 1280, 720
A = 1 << 16


def main():
    from sienerf_tpu.engines.nerf_baked import (
        _baked_sample_colors,
        _candidate_chain,
    )
    from sienerf_tpu.ops.baked import compact_candidates, cull_candidates
    from sienerf_tpu.ops.occupancy import occupied_bbox
    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.ops.raymarch import advance_to_occupied, composite_chunk

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    EV = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    eng, state = get_state()
    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]
    grid, meta = eng.bake_features(params, state["occ"], resolution=256, mode="nearest")
    float(jnp.asarray(grid["rows"][0, 0]))

    cam = eng.xforms[0]
    focal = tuple(np.asarray(eng.focals[0]) * W / eng.resolution[0])
    sc = tuple(np.asarray(eng.principal_points[0]))
    n = W * H
    cam_spec = (W, H, focal, cam, sc, jnp.asarray([0.5, 0.5], jnp.float32))
    bounds = occupied_bbox(bitfield)
    ids = jnp.arange(A, dtype=jnp.int32)
    o, d, dn, t0, t1 = eng._frame_make_rays(ids, n, cam_spec, bounds)
    t0 = advance_to_occupied(eng.march, bitfield, o, d, t0, t1, eng.init_advance_iters)

    minT = jnp.asarray(0.01, jnp.float32)
    T0 = jnp.ones((A,), jnp.float32)

    def stage(level, o, d, t0, t1, p):
        ts, dts, t_end = _candidate_chain(t0, eng.march.cone_angle, P, 1.0)
        if level == 0:
            return ts.sum() + t_end.sum()
        valid = (ts < t1[:, None])
        pos = o[:, None, :] + ts[..., None] * d[:, None, :]
        keep = valid & cull_candidates(grid["bits"], meta["resolution"], meta["n_cascades"], pos)
        if level == 1:
            return jnp.sum(keep)
        kept, ts_c, dts_c = compact_candidates(keep, EV + 1, ts, dts)
        kept, ts_c, dts_c = kept[:, :EV], ts_c[:, :EV], dts_c[:, :EV]
        if level == 2:
            return jnp.sum(ts_c) + jnp.sum(kept)
        rgb, dens = _baked_sample_colors(eng, p, grid, meta, o, d, ts_c, kept)
        if level == 3:
            return jnp.sum(rgb) + jnp.sum(dens)
        rgb_sum, opacity, T_out, bw, bt = composite_chunk(rgb, dens, ts_c, dts_c, kept, T0, minT)
        return jnp.sum(rgb_sum) + jnp.sum(T_out)

    names = ["chain", "+cull", "+compact", "+colors", "+composite"]
    prev = 0.0
    for lv in range(5):
        @partial(jax.jit, static_argnums=0)
        def run(lv, o, d, t0, t1, p, iters=8):
            def body(i, acc):
                return acc + stage(lv, o, d, t0 + i * 1e-4, t1, p)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        r = run(lv, o, d, t0, t1, params)
        float(r)
        t = time.time()
        r = run(lv, o, d, t0, t1, params)
        float(r)
        dt = (time.time() - t) / 8
        print(f"{names[lv]:12s} {dt*1e3:8.2f} ms/round  (delta {1e3*(dt-prev):7.2f})")
        prev = dt


if __name__ == "__main__":
    main()

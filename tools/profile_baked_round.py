"""Stage-by-stage timing of one _baked_round on real TPU.

Cumulative prefixes of the ACTUAL round body (advance, +chain, +cull,
+merge, +compact, +colors, +composite), each loop-amortized inside one jit
(tunnel-safe), plus the full _baked_round (march/eval + flush/refill tail)
timed with state threaded through the loop exactly like the production
lax.while_loop — the "+flush" line is full-round minus the +composite
prefix.

Usage: FOX_CACHE=fox_4k.pkl python tools/profile_baked_round.py [P] [evals] [step_scale] [adv_iters]
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
    from sienerf_tpu.common import MIN_CONE_STEPSIZE
    from sienerf_tpu.engines.nerf_baked import (
        _baked_round,
        _baked_sample_colors,
        _candidate_chain,
    )
    from sienerf_tpu.ops.baked import (
        compact_candidates,
        lookup_bits,
        merge_same_vertex_runs,
        nearest_vertex_ids,
    )
    from sienerf_tpu.ops.occupancy import occupied_bbox
    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.ops.raymarch import (
        advance_to_occupied,
        composite_chunk,
        retreat_to_occupied,
    )

    from sienerf_tpu.engines.nerf_baked import resolve_baked_knobs

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    EV = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    SS = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    ADV = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    KNOBS = resolve_baked_knobs()  # SIENERF_CULL / SIENERF_FINE / *_HEADS env
    print(f"# P={P} EV={EV} SS={SS} ADV={ADV} knobs={KNOBS}")

    eng, state = get_state()
    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]
    grid, meta = eng.bake_features(params, state["occ"], resolution=256, mode="nearest")
    float(jnp.asarray(grid["rows"][0, 0]))
    R, K = meta["resolution"], meta["n_cascades"]

    cam = eng.xforms[0]
    focal = tuple(np.asarray(eng.focals[0]) * W / eng.resolution[0])
    sc = tuple(np.asarray(eng.principal_points[0]))
    n = W * H
    cam_spec = (W, H, focal, cam, sc, jnp.asarray([0.5, 0.5], jnp.float32))
    bounds = occupied_bbox(bitfield)
    ids = jnp.arange(A, dtype=jnp.int32)
    o, d, dn, t0, t1 = eng._frame_make_rays(ids, n, cam_spec, bounds)
    t0 = advance_to_occupied(eng.march, bitfield, o, d, t0, t1, eng.init_advance_iters)
    t1 = retreat_to_occupied(eng.march, bitfield, o, d, t0, t1, eng.init_advance_iters)

    minT = jnp.asarray(0.01, jnp.float32)
    T0 = jnp.ones((A,), jnp.float32)
    bound = int(
        np.ceil(np.sqrt(3.0) * (2 ** (K - 1) / R) / (MIN_CONE_STEPSIZE * SS))
    ) + 2

    def stage(level, o, d, t0, t1, p, grid, bitfield):
        t = advance_to_occupied(eng.march, bitfield, o, d, t0, t1, ADV)
        if level == 0:
            return jnp.sum(t)
        ts, dts, t_end = _candidate_chain(t, eng.march.cone_angle, P, SS)
        if level == 1:
            return jnp.sum(ts) + jnp.sum(t_end)
        valid = ts < t1[:, None]
        pos = o[:, None, :] + ts[..., None] * d[:, None, :]
        flat, oob, _ = nearest_vertex_ids(R, K, pos)
        if level == 1.5:  # vertex-id arithmetic alone (pos, mip, flat id)
            return jnp.sum(flat) + jnp.sum(oob)
        # production cull (SIENERF_CULL-aware; coarse sidecar by default)
        from sienerf_tpu.engines.nerf_baked import _cull_keep

        keep, flat = _cull_keep(grid, meta, pos, valid, KNOBS[0], KNOBS[2])
        if level == 2:
            return jnp.sum(keep)
        if bound < P:
            keep, dts = merge_same_vertex_runs(flat, keep, dts, max_run=bound)
        if level == 3:
            return jnp.sum(keep) + jnp.sum(dts)
        kept, ts_c, dts_c = compact_candidates(keep, EV + 1, ts, dts)
        kept, ts_c, dts_c = kept[:, :EV], ts_c[:, :EV], dts_c[:, :EV]
        if level == 4:
            return jnp.sum(ts_c) + jnp.sum(kept)
        if level == 5:
            # fine feature gather ALONE (no color MLP) — splits the "+colors"
            # delta into gather vs MLP, which decides whether a deferred
            # per-ray shading path is worth anything
            from sienerf_tpu.ops.baked import baked_features

            pos_c = o[:, None, :] + ts_c[..., None] * d[:, None, :]
            raw = baked_features(
                grid["rows"], grid["scale"], R, K, meta["mode"],
                pos_c.reshape(-1, 3),
            )
            return jnp.sum(raw)
        rgb, dens = _baked_sample_colors(eng, p, grid, meta, o, d, ts_c, kept)
        if level == 6:
            return jnp.sum(rgb) + jnp.sum(dens)
        rgb_sum, opacity, T_out, bw, bt = composite_chunk(
            rgb, dens, ts_c, dts_c, kept, T0, minT
        )
        return jnp.sum(rgb_sum) + jnp.sum(T_out)

    names = {0: "advance", 1: "+chain", 1.5: "+ids", 2: "+bits", 3: "+merge",
             4: "+compact", 5: "+gather", 6: "+colors", 7: "+composite"}
    prev = 0.0
    composite_total = 0.0
    for lv in (0, 1, 1.5, 2, 3, 4, 5, 6, 7):

        # grid/bitfield MUST be jit arguments, not closure captures: captured
        # device arrays become HLO constants and poison gathers ~100x
        # (NOTES_ROUND1.md measured fact #2) — production threads them as args
        @partial(jax.jit, static_argnums=0)
        def run(lv, o, d, t0, t1, p, grid, bitfield, iters=8):
            def body(i, acc):
                return acc + stage(lv, o, d, t0 + i * 1e-4, t1, p, grid, bitfield)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        r = run(lv, o, d, t0, t1, params, grid, bitfield)
        float(r)
        t = time.time()
        r = run(lv, o, d, t0, t1, params, grid, bitfield)
        float(r)
        dt = (time.time() - t) / 8
        print(f"{names[lv]:12s} {dt*1e3:8.2f} ms/round  (delta {1e3*(dt-prev):7.2f})")
        prev = dt
        composite_total = dt

    # full round (march/eval + flush/refill), state threaded like production
    rays_pre = eng._frame_pack_rays(o, d, dn, t0, t1)
    zero = jnp.zeros((A,), jnp.float32)
    st = dict(
        ids=ids, o=o, d=d, dnorm=dn, t=t0, t1=t1,
        T=jnp.ones((A,), jnp.float32), rgb=jnp.zeros((A, 3), jnp.float32),
        op=zero, bw=zero, bt=zero, valid=ids < n,
        chunks=jnp.zeros((A,), jnp.int32), used=jnp.zeros((A,), jnp.int32),
        cursor=jnp.asarray(A, jnp.int32), minT=minT,
        out=jnp.zeros((n + 1, 5), jnp.float32),
        n_rounds=jnp.asarray(0, jnp.int32),
        n_ray_rounds=jnp.asarray(0, jnp.int32),
        n_evals=jnp.asarray(0, jnp.int32),
        n_overflow=jnp.asarray(0, jnp.int32),
    )

    from sienerf_tpu.engines.nerf_baked import _baked_accum_pass

    @jax.jit
    def run_accum(st, p, grid, bitfield, iters=8):
        # production-shaped loop (state threaded) WITHOUT the flush/refill
        # tail: full-round minus this isolates the tail's true cost in situ
        # (the isolated-prefix stages above run a different workload, so
        # their delta to 'full round' conflates tail cost with divergence)
        def body(i, s):
            return _baked_accum_pass(
                eng, s, p, grid, meta, bitfield, P, EV, SS, 24, ADV, KNOBS
            )

        return jax.lax.fori_loop(0, iters, body, st)

    @jax.jit
    def run_full(st, p, grid, bitfield, rays_pre, iters=8):
        def body(i, s):
            return _baked_round(
                eng, s, p, grid, meta, bitfield, n, rays_pre, P, EV, SS, 24, ADV,
                KNOBS,
            )

        return jax.lax.fori_loop(0, iters, body, st)

    accum_dt = None
    for name, fn in (("accum only", lambda: run_accum(st, params, grid, bitfield)),
                     ("full round", lambda: run_full(st, params, grid, bitfield, rays_pre))):
        out = fn()
        jax.block_until_ready(out["out"])
        t = time.time()
        out = fn()
        jax.block_until_ready(out["out"])
        dt = (time.time() - t) / 8
        ref = composite_total if accum_dt is None else accum_dt
        tag = "vs prefix" if accum_dt is None else "= flush/refill"
        print(f"{name:12s} {dt*1e3:8.2f} ms/round  (delta {1e3*(dt-ref):7.2f} {tag})")
        if accum_dt is None:
            accum_dt = dt


if __name__ == "__main__":
    main()

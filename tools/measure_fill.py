"""Measure eval-slot fill in the streaming frame renderer: per round, how
many of the A*render_chunk evaluated sample positions are actually valid
marched samples?  Drives the round-2 compaction design.

Usage: FOX_CACHE=fox_prof.pkl python tools/measure_fill.py [chunk]
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402


def main():
    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.ops.raymarch import march_rays

    eng, state = get_state()
    if len(sys.argv) > 1:
        eng.render_chunk = int(sys.argv[1])
    params = inference_params(state["opt"], state["params"])
    params = eng._render_params(params)
    bf = state["occ"]["bitfield"]
    W, H = 1280, 720
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)
    cam = jnp.asarray(eng.xforms[0])
    n = W * H
    A = 1 << 14
    cam_spec = (W, H, fl, cam, (0.5, 0.5))

    from sienerf_tpu.ops.occupancy import occupied_bbox
    bounds = occupied_bbox(bf)
    ids_all = jnp.arange(n, dtype=jnp.int32)
    o_a, d_a, dn_a, t0_a, t1_a = eng._frame_make_rays(ids_all, n, cam_spec, bounds)
    from sienerf_tpu.ops.raymarch import advance_to_occupied
    t0_a = advance_to_occupied(eng.march, bf, o_a, d_a, t0_a, t1_a, eng.init_advance_iters)

    rays_pre = eng._frame_pack_rays(o_a, d_a, dn_a, t0_a, t1_a)
    ids0 = jnp.arange(A, dtype=jnp.int32)
    o0, d0, dn0, t00, t10 = eng._frame_take_rays(ids0, n, rays_pre)
    zero = jnp.zeros((A,), jnp.float32)
    s = dict(
        ids=ids0, o=o0, d=d0, dnorm=dn0, t=t00, t1=t10,
        T=jnp.ones((A,), jnp.float32), rgb=jnp.zeros((A, 3), jnp.float32),
        op=zero, bw=zero, bt=zero, valid=ids0 < n,
        chunks=jnp.zeros((A,), jnp.int32), used=jnp.zeros((A,), jnp.int32),
        cursor=jnp.asarray(A, jnp.int32),
        minT=jnp.asarray(0.01, jnp.float32),
        out=jnp.zeros((n + 1, 5), jnp.float32),
    )

    @jax.jit
    def round_with_fill(s, params, bf):
        # replicate the march the round will do, count valid samples
        ts, dts, counts, t_end = march_rays(
            eng.march, bf, s["o"], s["d"], s["t"], s["t1"],
            eng.render_chunk, eng.render_chunk * 3,
        )
        alive = eng._frame_alive(s)
        counts = jnp.where(alive, counts, 0)
        s2 = eng._frame_round(s, params, bf, n, rays_pre)
        return s2, jnp.sum(counts), jnp.sum(alive.astype(jnp.int32))

    tot_valid = 0
    tot_slots = 0
    tot_alive_slots = 0
    rounds = 0
    hist = []
    t_start = time.time()
    while True:
        s, nvalid, nalive = round_with_fill(s, params, bf)
        nvalid = int(nvalid); nalive = int(nalive)
        if nalive == 0:
            break
        tot_valid += nvalid
        tot_slots += A * eng.render_chunk
        tot_alive_slots += nalive * eng.render_chunk
        rounds += 1
        if rounds <= 10 or rounds % 20 == 0:
            hist.append((rounds, nalive, nvalid))
        if rounds > 3000:
            break
    dt = time.time() - t_start
    print(f"chunk={eng.render_chunk} A={A}: rounds={rounds}, total_valid_samples={tot_valid/1e6:.2f}M")
    print(f"fill vs all slots: {tot_valid/max(tot_slots,1):.3f}; vs alive slots: {tot_valid/max(tot_alive_slots,1):.3f}")
    print(f"samples/ray (frame avg): {tot_valid/n:.1f}; wall {dt:.0f}s (incl sync per round)")
    for r, na, nv in hist:
        print(f"  round {r:4d}: alive={na:6d} valid={nv:7d} fill_alive={nv/max(na*eng.render_chunk,1):.3f}")


if __name__ == "__main__":
    main()

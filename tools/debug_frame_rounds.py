"""Round-by-round diagnosis of the streaming frame renderer: alive counts,
pixel-stream cursor, and per-ray sample usage, in blocks of rounds.

Usage: FOX_CACHE=fox_compact.pkl python tools/debug_frame_rounds.py [chunk]
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402

BLOCK = 20


def main():
    from sienerf_tpu.ops.optim import inference_params

    eng, state = get_state()
    if len(sys.argv) > 1:
        eng.render_chunk = int(sys.argv[1])
    params = inference_params(state["opt"], state["params"])
    bf = state["occ"]["bitfield"]
    W, H = 1280, 720
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)
    cam = jnp.asarray(eng.xforms[0])
    n = W * H
    A = 1 << 15
    cam_spec = (W, H, fl, cam, (0.5, 0.5))

    ids_all = jnp.arange(n, dtype=jnp.int32)
    o_a, d_a, dn_a, t0_a, t1_a = eng._frame_make_rays(ids_all, n, cam_spec)
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
    def block(s, params, bf):
        def body(i, s):
            return eng._frame_round(s, params, bf, n, rays_pre)

        return jax.lax.fori_loop(0, BLOCK, body, s)

    tot_rounds = 0
    for b in range(40):
        t0 = time.time()
        s = block(s, params, bf)
        alive = np.asarray(eng._frame_alive(s))
        tot_rounds += BLOCK
        used = np.asarray(s["used"])
        chunks = np.asarray(s["chunks"])
        Tarr = np.asarray(s["T"])
        cur = int(s["cursor"])
        na = alive.sum()
        msg = (
            f"rounds {tot_rounds:4d}: alive={na:6d} cursor={cur:7d}/{n} "
            f"dt={time.time()-t0:5.1f}s"
        )
        if na:
            msg += (
                f" | alive used mean={used[alive].mean():6.1f} max={used[alive].max():4d}"
                f" chunks mean={chunks[alive].mean():5.1f}"
                f" T med={np.median(Tarr[alive]):.2e}"
            )
        print(msg, flush=True)
        if not na:
            break


if __name__ == "__main__":
    main()

"""Per-round frame-body profiling on real TPU: times _frame_round in-graph
(the while_loop body of render_frame), plus the full frame, at a given
render_chunk.  Usage: python tools/profile_frame.py [chunk]"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state, timeit  # noqa: E402
from tools.profile_eval import time_scalar  # noqa: E402

R = 16


def main():
    from sienerf_tpu.ops.optim import inference_params

    eng, state = get_state()
    if len(sys.argv) > 1:
        eng.render_chunk = int(sys.argv[1])
    params = inference_params(state["opt"], state["params"])
    bf = state["occ"]["bitfield"]
    W, H = 1280, 720
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)
    cam = eng.xforms[0]
    n = W * H
    A = 1 << 15
    cam_spec = (W, H, fl, jnp.asarray(cam), (0.5, 0.5))

    ids_all = jnp.arange(n, dtype=jnp.int32)
    o_a, d_a, dn_a, t0_a, t1_a = eng._frame_make_rays(ids_all, n, cam_spec)
    rays_pre = eng._frame_pack_rays(o_a, d_a, dn_a, t0_a, t1_a)
    ids0 = jnp.arange(A, dtype=jnp.int32)
    o0, d0, dn0, t00, t10 = eng._frame_take_rays(ids0, n, rays_pre)
    zero = jnp.zeros((A,), jnp.float32)
    s0 = dict(
        ids=ids0, o=o0, d=d0, dnorm=dn0, t=t00, t1=t10,
        T=jnp.ones((A,), jnp.float32), rgb=jnp.zeros((A, 3), jnp.float32),
        op=zero, bw=zero, bt=zero, valid=ids0 < n,
        chunks=jnp.zeros((A,), jnp.int32), used=jnp.zeros((A,), jnp.int32),
        cursor=jnp.asarray(A, jnp.int32),
        minT=jnp.asarray(0.01, jnp.float32),
        out=jnp.zeros((n + 1, 5), jnp.float32),
    )

    @jax.jit
    def rounds(s, params, bf):
        def body(i, s):
            return eng._frame_round(s, params, bf, n, rays_pre)

        s = jax.lax.fori_loop(0, R, body, s)
        return s["out"].sum()

    dt = time_scalar(rounds, s0, params, bf) / R
    K = eng.render_chunk
    print(f"_frame_round chunk={K}: {dt*1e3:.2f} ms/round "
          f"-> {A*K/dt/1e6:.1f} Msamples/s")

    def frame():
        return eng.render_frame(params, bf, W, H, cam, fl, tile=A)

    dtf = timeit(frame, n=3)
    print(f"render_frame 720p chunk={K}: {dtf*1e3:.1f} ms -> {W*H/dtf/1e6:.3f} Mrays/s")


if __name__ == "__main__":
    main()

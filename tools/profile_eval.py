"""Dissect eval_samples cost on real TPU: gather rate vs table layout and
per-piece costs — with R iterations of the op INSIDE one jit (fori_loop)
and a scalar output, so tunnel dispatch + host-transfer overheads don't
poison the numbers (they dominate naive per-call timing: a 67MB result
costs ~300ms to fetch through the tunnel).

Run after tools/profile_render.py (reuses .cache/fox_prof.pkl).
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402

R = 24  # in-graph repetitions


def time_scalar(jfn, *args, n=3):
    """Time a jitted scalar-returning fn; returns seconds per call."""
    r = jfn(*args)
    float(r)  # sync through host transfer (tunnel-safe)
    t0 = time.time()
    for _ in range(n):
        r = jfn(*args)
    float(r)
    return (time.time() - t0) / n


def bench_loop(make_op, label, work_per_iter, *args):
    """make_op(i, *args) -> scalar; loops R times in-graph.  Big arrays MUST
    come through *args (closure capture bloats the remote-compile request
    and poisons gather layouts)."""

    @jax.jit
    def f(*a):
        def body(i, acc):
            return acc + make_op(i, *a)

        return jax.lax.fori_loop(0, R, body, jnp.zeros((), jnp.float32))

    dt = time_scalar(f, *args) / R
    print(f"{label}: {dt*1e3:8.3f} ms/iter -> {work_per_iter/dt/1e6:8.1f} M/s")
    return dt


def bench_gather(n_rows, row_floats, n_gathers, dtype):
    table = jax.random.normal(jax.random.PRNGKey(0), (n_rows, row_floats), dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n_gathers,), 0, n_rows)

    @jax.jit
    def f(table, idx):
        def body(i, acc):
            rows = jnp.take(table, (idx + i) & (n_rows - 1), axis=0)
            return acc + rows.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, R, body, jnp.zeros((), jnp.float32))

    dt = time_scalar(f, table, idx) / R
    bytes_per = row_floats * table.dtype.itemsize
    print(
        f"gather rows={n_rows:>8} rowB={bytes_per:>4} dtype={dtype.__name__:>8}: "
        f"{dt*1e3:7.2f} ms  {n_gathers/dt/1e6:7.1f} Mrows/s  "
        f"{n_gathers*bytes_per/dt/1e9:6.1f} GB/s"
    )


def main():
    from sienerf_tpu.models.nerf_network import nerf_apply
    from sienerf_tpu.ops.encodings import sh_encode
    from sienerf_tpu.ops.hashgrid import hashgrid_encode
    from sienerf_tpu.ops.mlp import mlp_apply
    from sienerf_tpu.ops.optim import inference_params

    eng, state = get_state()
    params = inference_params(state["opt"], state["params"])
    cfg = eng.net

    N = 1 << 19
    pos0 = jax.random.uniform(jax.random.PRNGKey(0), (N, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    grid_t = params["grid"]
    dw = params["density_mlp"]
    rw = params["rgb_mlp"]

    # jitter positions per iteration so nothing is CSE'd/hoisted
    def enc_op(i, grid_t, pos0):
        p = jnp.mod(pos0 + i * 1e-5, 1.0)
        return hashgrid_encode(cfg.grid, grid_t, p).sum()

    bench_loop(enc_op, f"hashgrid_encode N={N}", N, grid_t, pos0)

    feats = hashgrid_encode(cfg.grid, grid_t, pos0)

    def dmlp_op(i, dw, feats):
        return mlp_apply(cfg.density_mlp, dw, feats + i * 1e-6).sum()

    bench_loop(dmlp_op, "density_mlp", N, dw, feats)

    def sh_op(i, dirs):
        return sh_encode(jnp.mod(dirs + i * 1e-5, 1.0), cfg.sh_degree).sum()

    bench_loop(sh_op, "sh_encode", N, dirs)

    def full_op(i, params, pos0, dirs):
        p = jnp.mod(pos0 + i * 1e-5, 1.0)
        rgb, dens = nerf_apply(cfg, params, p, dirs)
        return rgb.sum() + dens.sum()

    bench_loop(full_op, f"nerf_apply N={N}", N, params, pos0, dirs)

    # gather-rate matrix
    T = cfg.grid.table_size
    for dtype in (jnp.float32, jnp.bfloat16):
        for rowf in (8, 16, 32):
            bench_gather(T, rowf, 16 * N, dtype)
    for rows in (1 << 15, 1 << 17, 1 << 21):
        bench_gather(rows, 32, 16 * N, jnp.float32)

    # march chunk with in-graph loop
    from sienerf_tpu.ops.raymarch import march_rays
    from sienerf_tpu.utils.camera import uv_to_ray

    W, H = 1280, 720
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)
    cam = eng.xforms[0]
    bf = state["occ"]["bitfield"]
    A = 1 << 15
    ids = jnp.arange(A, dtype=jnp.int32)
    px = (ids % W).astype(jnp.float32)
    py = (ids // W).astype(jnp.float32)
    uv = jnp.stack([(px + 0.5) / W, (py + 0.5) / H], axis=-1)
    o, d = uv_to_ray(uv, (W, H), fl, cam)
    d_n = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t0_, t1_ = eng._aabb_times(o, d_n, 0.1)
    K = eng.render_chunk

    @jax.jit
    def march_f(bf, t_in):
        def body(i, carry):
            acc, t = carry
            ts, dts, counts, t_end = march_rays(eng.march, bf, o, d_n, t, t1_, K, K * 3)
            return (acc + ts.sum(), t_end)

        out, _ = jax.lax.fori_loop(0, R, body, (jnp.zeros((), jnp.float32), t_in))
        return out

    dt = time_scalar(march_f, bf, t0_) / R
    print(f"march chunk A={A} K={K}: {dt*1e3:.2f} ms/iter -> {A*K/dt/1e6:.1f} Msamples/s")


if __name__ == "__main__":
    main()

"""Coarse stage timing of one NeRF training step on real TPU.

Levels (loop-amortized, tunnel-safe):
  forward   — _loss_for_batch only (march + compact + eval + composite)
  +grad     — value_and_grad of the same
  full step — _train_one_step (adds optimizer + error-map splat)
  bundle/step — _train_bundle_jit / grid_interval (adds occupancy cadence)

VERDICT.md Weak #3: training is 160-280 ms/step vs ~6 ms/step
reference-class; this tells us where the next fight is.

Usage: FOX_CACHE=fox_4k.pkl python tools/profile_train.py
"""

import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402


def main():
    eng, state = get_state()
    n_rays, k, iters = eng._phase_geometry()
    print(f"# geometry: n_rays={n_rays} k={k} iters={iters} "
          f"grid_interval={eng.grid_interval}")
    key = jax.random.PRNGKey(7)
    data = eng.data

    # bitfield/data/emap are jit ARGS, not closure captures: captured device
    # arrays become HLO constants and poison gathers ~100x (NOTES_ROUND1 #2)
    def fwd(p, bitfield, data, emap, kk):
        loss, _ = eng._loss_for_batch(
            p, bitfield, data, kk, n_rays,
            emap, state["step"], k, iters,
        )
        return loss

    @jax.jit
    def run_fwd(p, bitfield, data, emap, key, n=8):
        def body(i, acc):
            return acc + fwd(p, bitfield, data, emap, jax.random.fold_in(key, i))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def run_grad(p, bitfield, data, emap, key, n=8):
        def body(i, acc):
            l, g = jax.value_and_grad(fwd)(p, bitfield, data, emap, jax.random.fold_in(key, i))
            return acc + l + sum(jnp.sum(x) for x in jax.tree.leaves(g))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def run_step(st, data, key, n=8):
        def body(i, st):
            st2, loss, cnt = eng._train_one_step(
                st, data, jax.random.fold_in(key, i), n_rays, None, k, iters
            )
            return st2

        return jax.lax.fori_loop(0, n, body, st)

    bitfield = state["occ"]["bitfield"]
    emap = state.get("emap")
    names_fns = [
        ("forward", lambda: run_fwd(state["params"], bitfield, data, emap, key)),
        ("+grad", lambda: run_grad(state["params"], bitfield, data, emap, key)),
        ("full step", lambda: run_step(state, data, key)),
    ]
    prev = 0.0
    for name, f in names_fns:
        r = f()
        jax.block_until_ready(r)
        t0 = time.time()
        r = f()
        jax.block_until_ready(r)
        dt = (time.time() - t0) / 8
        print(f"{name:12s} {dt*1e3:8.2f} ms/step  (delta {1e3*(dt-prev):8.2f})")
        prev = dt

    # full bundle (includes occupancy update once per grid_interval steps)
    st = state
    st, loss, cnt = eng.train_bundle(st, key)  # compile
    jax.block_until_ready(loss)
    t0 = time.time()
    st, loss, cnt = eng.train_bundle(st, jax.random.fold_in(key, 99))
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / eng.grid_interval
    print(f"{'bundle/step':12s} {dt*1e3:8.2f} ms/step  (occupancy cadence incl.)")


if __name__ == "__main__":
    main()

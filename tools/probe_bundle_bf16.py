"""Isolate the bf16-backward bundle anomaly (NOTES_ROUND4).

profile_train measured: fori_loop'd _train_one_step = 131 ms/step under
SIENERF_HASH_BWD=bf16, but the scanned train bundle = 832 ms/step (vs 327
under perlevel).  Three candidate culprits: lax.scan (vs fori_loop),
state donation, the occupancy-cadence prologue.  This probes each in one
process (loop-amortized, varied keys, one fetch per timing).

Usage: SIENERF_HASH_BWD=bf16 python tools/probe_bundle_bf16.py
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
    data = eng.data
    G = eng.grid_interval
    print(f"# geometry: n_rays={n_rays} k={k} iters={iters} G={G}")

    @jax.jit
    def run_fori(st, data, key):
        def body(i, st):
            st2, _, _ = eng._train_one_step(
                st, data, jax.random.fold_in(key, i), n_rays, None, k, iters
            )
            return st2

        return jax.lax.fori_loop(0, G, body, st)

    @jax.jit
    def run_scan(st, data, key):
        def body(st, kk):
            st2, loss, cnt = eng._train_one_step(st, data, kk, n_rays, None, k, iters)
            return st2, (loss, cnt)

        st, (losses, counts) = jax.lax.scan(body, st, jax.random.split(key, G))
        return st, jnp.mean(losses), jnp.mean(counts)

    @jax.jit
    def run_occ(st, data, key):
        return eng._occupancy_update(st, key, data, None)

    @partial(jax.jit, donate_argnums=0)
    def run_scan_donate(st, data, key):
        def body(st, kk):
            st2, loss, cnt = eng._train_one_step(st, data, kk, n_rays, None, k, iters)
            return st2, (loss, cnt)

        st, (losses, counts) = jax.lax.scan(body, st, jax.random.split(key, G))
        return st, jnp.mean(losses), jnp.mean(counts)

    key = jax.random.PRNGKey(3)

    def timeit(name, fn, per, n=2, donate=False):
        # donation consumes buffers: feed REAL copies (jnp.asarray on a
        # device array is a no-op alias — reusing it crashed this probe's
        # first run with INVALID_ARGUMENT on the donated buffers)
        st = jax.tree.map(jnp.copy, state) if donate else state
        r = fn(st, data, key)
        jax.block_until_ready(r)
        if donate:
            sts = [jax.tree.map(jnp.copy, state) for _ in range(n)]
        t0 = time.time()
        for i in range(n):
            r = fn(sts[i] if donate else state, data, jax.random.fold_in(key, i + 1))
            jax.block_until_ready(r)
        dt = (time.time() - t0) / n / per
        print(f"{name:22s} {dt*1e3:8.2f} ms/step")

    timeit("fori x16", run_fori, G)
    timeit("scan x16", run_scan, G)
    timeit("occ update alone", run_occ, 1)
    timeit("scan x16 + donate", run_scan_donate, G, donate=True)


if __name__ == "__main__":
    main()

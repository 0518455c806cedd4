"""Part 2 of the bf16 bundle anomaly hunt: the scan alone is fast
(129 ms/step) and the occupancy update alone is 540 ms, but the REAL
bundle jit (occ + scan, donated) measures 832 ms/step = 13.3 s.  A/B the
real bundle against a donation-free clone and an occ-after-scan variant.

Usage: SIENERF_HASH_BWD=<mode> python tools/probe_bundle_bf16b.py
"""

import sys
import time
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

    @jax.jit
    def bundle_nodonate(st, key, data):
        return eng._bundle_body(st, data, key, n_rays=n_rays, k=k, iters=iters)

    key = jax.random.PRNGKey(5)

    def timeit(name, call, n=2):
        r = call(jax.random.fold_in(key, 99))
        jax.block_until_ready(r)
        t0 = time.time()
        for i in range(n):
            r = call(jax.random.fold_in(key, i))
            jax.block_until_ready(r)
        dt = (time.time() - t0) / n / G
        print(f"{name:22s} {dt*1e3:8.2f} ms/step", flush=True)

    st0 = state
    timeit("bundle no-donate", lambda kk: bundle_nodonate(st0, kk, data))
    # the real path (donated state): feed fresh copies so donation is legal
    def real(kk):
        st = jax.tree.map(jnp.asarray, st0)
        return eng._train_bundle_jit(st, kk, data, n_rays, k, iters)

    timeit("bundle real(donate)", real)


if __name__ == "__main__":
    main()

"""Loop-amortized A/B of the hash-grid encode fwd/bwd at train shapes.

TIMING RULES on this box (NOTES_ROUND3): (a) repeated jit calls with
identical args return cached results — inputs vary per iteration INSIDE
the loop; (b) every device->host fetch pays a ~25-30 ms tunnel RTT — the
whole measurement is ONE jit with a fori_loop and ONE scalar output
(tools/profile_hashbwd.py's per-stage numbers were RTT artifacts).

The table is created as a JIT OUTPUT in its training shape (L,T,C,F):
boundary layout negotiation then picks the packed layout, whereas an
in-jit reshape from flat materializes the T(8,128) tile-padded form
(34 GB OOM, measured — NOTES_ROUND4).

Usage: SIENERF_HASH_BWD=<mode> python tools/ab_hashbwd.py [N] [ITERS]
"""

import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sienerf_tpu.ops.hashgrid import (  # noqa: E402
    HASH_BWD_MODE,
    HashGridConfig,
    hashgrid_encode,
)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = HashGridConfig.from_network_config(
        {"otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
         "log2_hashmap_size": 19, "base_resolution": 16,
         "per_level_scale": 1.5}, aabb_scale=4.0,
    )
    L, F, C, T = cfg.n_levels, cfg.n_features_per_level, 1 << cfg.n_dims, cfg.table_size
    print(f"# mode={HASH_BWD_MODE} N={N} iters={iters} L={L} T={T}")
    # the table must be BORN as a jit output in its training shape: an
    # in-jit reshape from flat materializes the T(8,128) tile-padded form
    # (f32[16,524288,8,2]{T(8,128)} = 34 GB, measured OOM on this stack);
    # jit-boundary layout negotiation picks the sane packed layout instead
    table = jax.jit(
        lambda k: jax.random.uniform(k, (L, T, C, F), jnp.float32, -1e-4, 1e-4)
    )(jax.random.PRNGKey(0))

    def shaped(tf):
        return tf

    @jax.jit
    def run_fwd(tf, key):
        t = shaped(tf)

        def body(i, acc):
            pos = jax.random.uniform(jax.random.fold_in(key, i), (N, 3))
            out = hashgrid_encode(cfg, t, pos)
            return acc + out[0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @jax.jit
    def run_bwd(tf, key):
        t = shaped(tf)

        def body(i, acc):
            kk = jax.random.fold_in(key, i)
            pos = jax.random.uniform(kk, (N, 3))
            g = jax.random.normal(jax.random.fold_in(kk, 1), (N, L * F))

            def loss(tt):
                return jnp.vdot(hashgrid_encode(cfg, tt, pos), g)

            dt = jax.grad(loss)(t)
            return acc + dt[0, 0, 0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    for name, fn in (("fwd", run_fwd), ("fwd+bwd", run_bwd)):
        out = fn(table, jax.random.PRNGKey(1))
        float(out)  # compile+warm
        t0 = time.time()
        out = fn(table, jax.random.PRNGKey(2))
        float(out)
        dt = (time.time() - t0) / iters * 1e3
        print(f"{name:8s} {dt:8.2f} ms/iter")


if __name__ == "__main__":
    main()

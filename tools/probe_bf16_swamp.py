"""TPU probe: bf16 scatter-accumulation swamping at production shapes
(ADVICE r4).  Runs the bf16 hash backward vs the f32 perlevel backward at
the real nerf config (L=16, T=2^19) with 2^20 positions concentrated in a
0.05^3 corner (thousands of collisions per coarse bucket) and reports the
relative error on dominant rows.

Measured 2026-08-21 (v5e via axon): mixed-sign max rel 0.0218 mean 0.0019
cos 0.99996; same-sign max rel 0.0035 — the TPU segment_sum reduces
hierarchically, so bf16 error grows ~log(n); no serial-swamping plateau.
(The CPU backend under --xla_force_host_platform_device_count=8
accumulates serially and shows max rel 2.6 on the same input — ordering,
not algorithm.)

Usage: python tools/probe_bf16_swamp.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from sienerf_tpu.ops import hashgrid as hg
    from sienerf_tpu.ops.hashgrid import (
        HashGridConfig, hashgrid_encode, init_hashgrid_params)

    print("backend", jax.devices())
    cfg = HashGridConfig(n_levels=16, log2_hashmap_size=19, n_dims=3)
    table = init_hashgrid_params(jax.random.PRNGKey(0), cfg) * 1e4
    N = 1 << 20
    pos = jax.random.uniform(jax.random.PRNGKey(2), (N, 3)) * 0.05
    F = cfg.n_levels * cfg.n_features_per_level

    for name, w in [
        ("mixed-sign", jax.random.normal(jax.random.PRNGKey(3), (N, F))),
        ("same-sign", jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (N, F)))),
    ]:
        def loss(t):
            return jnp.vdot(hashgrid_encode(cfg, t, pos), w)

        hg.HASH_BWD_MODE = "perlevel"
        d32 = np.asarray(jax.grad(loss)(table))
        hg.HASH_BWD_MODE = "bf16"
        d16 = np.asarray(jax.grad(loss)(table))
        scale = np.abs(d32).max()
        big = np.abs(d32) > 0.05 * scale
        rel = np.abs(d32[big] - d16[big]) / np.abs(d32[big])
        cos = np.vdot(d32.ravel(), d16.ravel()) / (
            np.linalg.norm(d32) * np.linalg.norm(d16))
        print(f"{name}: max rel {rel.max():.4f} mean {rel.mean():.5f} "
              f"cos {cos:.6f} nbig {int(big.sum())}")


if __name__ == "__main__":
    main()

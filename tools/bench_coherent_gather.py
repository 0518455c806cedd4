"""Does index locality move the big-table gather wall?

The fine-eval gather runs at ~91 M rows/s from the 0.8 GB baked table with
RANDOM indices (tools/bench_baked_gather.py).  Real candidate chains are
not random: consecutive survivors walk small strides (1 / Rv / Rv^2) from
a per-ray base.  This measures the locality ladder at the actual table
geometry ((3*257^3, 4) int32 = 16 B rows):

  random   — the established ~91 M rows/s baseline
  walk64   — runs of 64 coherent voxel steps (the candidate-chain pattern)
  walk8    — runs of 8 (post-compaction survivor pattern)
  sorted   — globally ascending indices (locality upper bound)

If sorted >> random, the wall is address locality and a Morton-ordered
bake layout (+ sorting survivor gathers) is worth building; if they are
equal, the wall is descriptor issue rate and re-layout is pointless.

Usage: python tools/bench_coherent_gather.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

T = 3 * 257**3  # 50.9M rows x 16 B = 0.8 GB
Rv = 257
N = 1 << 22


def run_case(name, idx, iters=8):
    # jnp.ones picks the packed (row-major) layout; an eager arange+reshape
    # materializes a T(8,128)-tiled 26 GB intermediate and OOMs the chip.
    table = jnp.ones((T, 4), jnp.int32)

    @jax.jit
    def run(table, idx):
        def body(i, acc):
            out = jnp.take(table, (idx + i) % T, axis=0)
            return acc + jnp.sum(out, dtype=jnp.int32)

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    r = run(table, idx)
    int(r)
    t0 = time.time()
    r = run(table, idx)
    int(r)
    dt = (time.time() - t0) / iters
    print(f"{name:8s} {dt*1e3:8.2f} ms  {N/dt/1e6:7.1f} M rows/s", flush=True)


def main():
    rng = np.random.default_rng(0)
    rand = rng.integers(0, T, size=N, dtype=np.int32)
    run_case("random", jnp.asarray(rand))

    for run_len in (64, 8):
        n_rays = N // run_len
        base = rng.integers(0, T - 3 * run_len * Rv * Rv, size=(n_rays, 1), dtype=np.int64)
        steps = rng.choice([1, Rv, Rv * Rv], size=(n_rays, run_len)).astype(np.int64)
        idx = ((base + np.cumsum(steps, axis=1)).reshape(-1) % T).astype(np.int32)
        run_case(f"walk{run_len}", jnp.asarray(idx))

    run_case("sorted", jnp.asarray(np.sort(rand)))


if __name__ == "__main__":
    main()

"""Pallas DMA-gather benchmark: can pipelined per-row async copies beat
XLA's random-gather wall?

Measured (tools/bench_baked_gather.py, v5e-1): XLA jnp.take of random
16-byte rows runs ~343M rows/s from tables <= 2MB but plateaus at ~91M
rows/s for any table >= 64MB — the baked feature table (0.8GB) gathers at
the plateau, which floors the baked renderer's fine-eval stage.  This
kernel issues one DMA per row with a W-deep in-flight window (slot b%W
waits on its prior user before reuse), indices streamed to SMEM per block.
If descriptor issue rate — not table size — is the true limit, this should
recover the small-table rate on the big table.

Variants: row width C (int32 lanes) and rows-per-descriptor G (contiguous
G-row bursts per index, the brick-lite shape).

Usage: python tools/bench_pallas_gather.py [--interpret]
"""

import functools
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


_TABLES = {}


def _make_table(T, C):
    """Big bench tables are built host-side and device_put once: building
    them on device hits XLA's padded (8,128) tiling for narrow minor dims
    on some construction ops (a 50M x 4 reshape output wanted 25.6 GB)."""
    if (T, C) not in _TABLES:
        _TABLES[(T, C)] = jax.device_put(
            np.arange(T * C, dtype=np.int32).reshape(T, C)
        )
    return _TABLES[(T, C)]


def gather_rows_pallas(table, idx, block: int = 512, window: int = 16,
                       g: int = 1, interpret: bool = False):
    """Gather table[idx[i]:idx[i]+g] rows -> (N, g, C) via manual DMAs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = idx.shape[0]
    C = table.shape[1]
    B = block
    W = window
    assert N % B == 0 and B >= W

    def kernel(idx_ref, table_ref, out_ref, sems):
        def dma(b):
            i = idx_ref[b]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(i, g)],
                out_ref.at[b],
                sems.at[jax.lax.rem(b, W)],
            )

        def body(b, _):
            @pl.when(b >= W)
            def _():
                dma(b - W).wait()

            dma(b).start()
            return 0

        jax.lax.fori_loop(0, B, body, 0)

        def drain(i, _):
            dma(B - W + i).wait()
            return 0

        jax.lax.fori_loop(0, W, drain, 0)

    return pl.pallas_call(
        kernel,
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, g, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, g, C), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((W,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, table)


def bench(T, C, N, g=1, block=512, window=16, iters=8, interpret=False):
    table = _make_table(T, C)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T - g, dtype=jnp.int32)

    f = functools.partial(
        gather_rows_pallas, block=block, window=window, g=g, interpret=interpret
    )

    @jax.jit
    def run(table, idx):
        def body(i, acc):
            out = f(table, (idx + i) % (T - g))
            return acc + out[0, 0, 0] + out[-1, -1, -1]

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    # correctness spot-check (one call, compare vs jnp.take)
    out = f(table, idx)
    ref = jnp.stack([jnp.take(table, idx + j, axis=0) for j in range(g)], axis=1)
    ok = bool(jnp.array_equal(out, ref))

    r = run(table, idx)
    jax.block_until_ready(r)
    t0 = time.time()
    r = run(table, idx)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    rows = N * g
    mb = T * C * 4 / 1e6
    print(
        f"pallas T={T:>9} ({mb:7.1f}MB) C={C:2d} g={g} B={block} W={window}: "
        f"{dt*1e3:8.2f} ms  {rows/dt/1e6:7.1f} M rows/s  "
        f"{rows*C*4/dt/1e9:6.2f} GB/s  correct={ok}"
    )
    return rows / dt


def bench_xla(T, C, N, iters=8):
    table = _make_table(T, C)
    idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, T, dtype=jnp.int32)

    @jax.jit
    def run(table, idx):
        def body(i, acc):
            out = jnp.take(table, (idx + i) % T, axis=0)
            return acc + out[0, 0] + out[-1, -1]

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    r = run(table, idx)
    jax.block_until_ready(r)
    t0 = time.time()
    r = run(table, idx)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    print(
        f"xla    T={T:>9} ({T*C*4/1e6:7.1f}MB) C={C:2d}:           "
        f"{dt*1e3:8.2f} ms  {N/dt/1e6:7.1f} M rows/s  {N*C*4/dt/1e9:6.2f} GB/s"
    )
    return N / dt


def bench_xla_coherent(T, C, N, run_len=64, iters=8):
    """XLA gather with RAY-COHERENT indices: consecutive groups of run_len
    indices walk small strides (1 / Rv / Rv^2 voxel steps) from a random
    base — the actual access pattern of baked candidate chains.  If this
    beats the random-index plateau, the 91M rows/s wall is an address-
    locality effect and a Morton-ordered bake layout is the fix."""
    Rv = 257
    table = _make_table(T, C)
    n_rays = N // run_len
    key = jax.random.PRNGKey(1)
    base = jax.random.randint(key, (n_rays, 1), 0, T - 3 * run_len * Rv * Rv, dtype=jnp.int32)
    steps = jnp.asarray(
        np.random.default_rng(2).choice([1, Rv, Rv * Rv], size=(n_rays, run_len)), jnp.int32
    )
    idx = (base + jnp.cumsum(steps, axis=1)).reshape(-1) % T

    @jax.jit
    def run(table, idx):
        def body(i, acc):
            out = jnp.take(table, (idx + i) % T, axis=0)
            return acc + out[0, 0] + out[-1, -1]

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    r = run(table, idx)
    jax.block_until_ready(r)
    t0 = time.time()
    r = run(table, idx)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    print(
        f"xla-co T={T:>9} ({T*C*4/1e6:7.1f}MB) C={C:2d} run={run_len}:   "
        f"{dt*1e3:8.2f} ms  {N/dt/1e6:7.1f} M rows/s  {N*C*4/dt/1e9:6.2f} GB/s"
    )
    return N / dt


def main():
    interpret = "--interpret" in sys.argv
    if interpret:
        # tiny correctness pass on CPU interpreter (before any backend touch;
        # the axon site hook otherwise forces the TPU platform)
        jax.config.update("jax_platforms", "cpu")
        bench(1 << 12, 4, 1 << 10, g=1, block=256, window=8, iters=1, interpret=True)
        bench(1 << 12, 4, 1 << 10, g=4, block=256, window=8, iters=1, interpret=True)
        return
    N = 1 << 20
    big = 50_000_000  # ~0.8GB at C=4 — the baked table regime
    bench_xla(big, 4, N)
    bench_xla_coherent(big, 4, N, run_len=64)
    bench_xla_coherent(big, 4, N, run_len=8)
    for W in (8, 16, 32):
        bench(big, 4, N, g=1, window=W)
    bench(big, 4, N, g=1, block=1024, window=32)
    bench(big, 4, N >> 3, g=8, window=16)   # 128B bursts
    bench(1 << 17, 4, N, g=1, window=16)    # small table: near-core regime
    bench_xla(1 << 17, 4, N)


if __name__ == "__main__":
    main()

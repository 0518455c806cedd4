"""Pallas DMA-gather benchmark: can pipelined per-row async copies beat
XLA's random-gather wall?

Measured (tools/bench_baked_gather.py, v5e-1): XLA jnp.take of random
16-byte rows runs ~343M rows/s from tables <= 2MB but plateaus at ~91M
rows/s for any table >= 64MB; 128-byte rows from big tables collapse to
~26M rows/s.  The baked feature table (0.8GB) gathers at the plateau,
which floors the baked renderer's fine-eval stage.

This kernel issues one DMA per 512-byte row — the table is laid out as
(T//32, 128) int32 so each row is exactly one (1,128) tile line (Mosaic
rejects sub-lane HBM memref slices like (1,4); that shape also OOMs when
materialized tiled, see campaign_b.log) — with a W-deep in-flight window
(slot b%W waits on its prior user before reuse), indices in SMEM per block.
If descriptor issue rate — not table size — is the true limit, this should
recover the small-table rate on the big table: 32 logical 16B rows ride
along free per fetch, and the renderer's gather loop can pick lanes
in-register.

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


def _make_table(T32):
    """(T32, 128) int32 built host-side and device_put once (row r, lane l
    holds r*131 + l so correctness checks are cheap)."""
    if T32 not in _TABLES:
        r = np.arange(T32, dtype=np.int32)[:, None] * np.int32(131)
        _TABLES[T32] = jax.device_put(r + np.arange(128, dtype=np.int32)[None, :])
    return _TABLES[T32]


def gather_rows_pallas(table, idx, block: int = 1024, window: int = 16,
                       g: int = 1, interpret: bool = False):
    """Gather table[idx[i]*g : idx[i]*g+g] -> (N, g, 128) via manual DMAs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = idx.shape[0]
    B = block
    W = window
    assert N % B == 0 and B >= W

    def kernel(idx_ref, table_ref, out_ref, sems):
        def dma(b):
            i = idx_ref[b]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(i * g, g)],
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
        out_specs=pl.BlockSpec((B, g, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, g, 128), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((W,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, table)


def bench(T32, N, g=1, block=1024, window=16, iters=8, interpret=False):
    table = _make_table(T32)
    key = jax.random.PRNGKey(0)
    hi = T32 // g
    idx = jax.random.randint(key, (N,), 0, hi, dtype=jnp.int32)

    f = functools.partial(
        gather_rows_pallas, block=block, window=window, g=g, interpret=interpret
    )

    @jax.jit
    def run(table, idx):
        def body(i, acc):
            out = f(table, (idx + i) % hi)
            # consume every fetched byte so nothing dead-code-eliminates
            return acc + jnp.sum(out, dtype=jnp.int32)

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    # correctness spot-check (one call, compare vs jnp.take)
    out = f(table, idx)
    ref = jnp.stack([jnp.take(table, idx * g + j, axis=0) for j in range(g)], axis=1)
    ok = bool(jnp.array_equal(out, ref))

    r = run(table, idx)
    int(r)
    t0 = time.time()
    r = run(table, idx)
    int(r)
    dt = (time.time() - t0) / iters
    rows = N * g
    mb = T32 * 512 / 1e6
    print(
        f"pallas T32={T32:>9} ({mb:7.1f}MB) g={g} B={block} W={window}: "
        f"{dt*1e3:8.2f} ms  {rows/dt/1e6:7.1f} M rows/s  "
        f"{rows*512/dt/1e9:6.2f} GB/s  correct={ok}",
        flush=True,
    )
    return rows / dt


def bench_xla(T32, N, iters=8):
    """XLA jnp.take of the same 512B rows, result fully consumed."""
    table = _make_table(T32)
    idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, T32, dtype=jnp.int32)

    @jax.jit
    def run(table, idx):
        def body(i, acc):
            out = jnp.take(table, (idx + i) % T32, axis=0)
            return acc + jnp.sum(out, dtype=jnp.int32)

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    r = run(table, idx)
    int(r)
    t0 = time.time()
    r = run(table, idx)
    int(r)
    dt = (time.time() - t0) / iters
    print(
        f"xla    T32={T32:>9} ({T32*512/1e6:7.1f}MB) 512B rows:     "
        f"{dt*1e3:8.2f} ms  {N/dt/1e6:7.1f} M rows/s  {N*512/dt/1e9:6.2f} GB/s",
        flush=True,
    )
    return N / dt


def main():
    interpret = "--interpret" in sys.argv
    if interpret:
        # tiny correctness pass on CPU interpreter (before any backend touch;
        # the axon site hook otherwise forces the TPU platform)
        jax.config.update("jax_platforms", "cpu")
        bench(1 << 12, 1 << 10, g=1, block=1024, window=8, iters=1, interpret=True)
        bench(1 << 12, 1 << 10, g=2, block=1024, window=8, iters=1, interpret=True)
        return
    N = 1 << 20
    big = 1_600_000  # (1.6M, 128) i32 = 0.8GB — the baked table regime
    bench_xla(big, N)
    for W in (8, 16, 32):
        bench(big, N, g=1, window=W)
    bench(big, N, g=1, block=4096, window=32)
    bench(big, N >> 2, g=4, window=16)      # 2KB bursts
    bench(1 << 14, N, g=1, window=16)       # small table: near-core regime
    bench_xla(1 << 14, N)


if __name__ == "__main__":
    main()

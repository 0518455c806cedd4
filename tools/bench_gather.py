"""Microbenchmark: random-row gather rate on TPU — the render path's wall.

The round-1 perf model measured ~44M rows/s for XLA gathers of 128B hash
rows from HBM; the whole render architecture sits behind that number
(NOTES_ROUND1.md).  This measures every strategy that could beat it:

  a. XLA jnp.take of (T, C) rows, fp32/bf16, various T and C
  b. the same with sorted indices (spatial locality)
  c. 8 independent level gathers in one jit (does XLA overlap them?)
  d. pallas kernel: table resident in VMEM, per-block gather
  e. one-hot matmul on the MXU (gather as dense contraction)

Usage: python tools/bench_gather.py [variant ...]
"""

import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    return (time.time() - t0) / n


def bench_xla(T, C, N, dtype, sort=False, n_tables=1):
    key = jax.random.PRNGKey(0)
    tables = [
        jax.random.normal(jax.random.fold_in(key, i), (T, C), dtype)
        for i in range(n_tables)
    ]
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)
    if sort:
        idx = jnp.sort(idx)

    @jax.jit
    def f(idx, *tbls):
        return sum(
            jnp.take(tb, idx, axis=0, indices_are_sorted=sort).astype(jnp.float32)
            for tb in tbls
        )

    dt = timeit(f, idx, *tables)
    rate = N * n_tables / dt
    print(
        f"xla  T=2^{int(np.log2(T)):2d} C={C:3d} {np.dtype(dtype).name:8s} "
        f"N=2^{int(np.log2(N)):2d} x{n_tables} sorted={int(sort)}: "
        f"{dt*1e3:7.2f} ms  {rate/1e6:8.1f} M rows/s  "
        f"{rate * C * np.dtype(dtype).itemsize / 1e9:6.1f} GB/s"
    )
    return rate


def bench_pallas(T, C, N, dtype):
    """Table lives in VMEM; kernel gathers row blocks with jnp.take."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BLK = 1024
    table = jax.random.normal(jax.random.PRNGKey(0), (T, C), dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)

    def kernel(idx_ref, tbl_ref, out_ref):
        out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def f(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, C), dtype),
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table resident
            ],
            out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(idx, table)

    dt = timeit(f, idx, table)
    rate = N / dt
    print(
        f"plas T=2^{int(np.log2(T)):2d} C={C:3d} {np.dtype(dtype).name:8s} "
        f"N=2^{int(np.log2(N)):2d}: {dt*1e3:7.2f} ms  {rate/1e6:8.1f} M rows/s"
    )
    return rate


def bench_onehot(T, C, N, dtype):
    """Gather as onehot @ table on the MXU."""
    table = jax.random.normal(jax.random.PRNGKey(0), (T, C), dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)

    @jax.jit
    def f(idx, table):
        oh = jax.nn.one_hot(idx, T, dtype=dtype)
        return oh @ table

    dt = timeit(f, idx, table, n=5)
    rate = N / dt
    print(
        f"1hot T=2^{int(np.log2(T)):2d} C={C:3d} {np.dtype(dtype).name:8s} "
        f"N=2^{int(np.log2(N)):2d}: {dt*1e3:7.2f} ms  {rate/1e6:8.1f} M rows/s"
    )
    return rate


def bench_split(T, C, N, dtype, k, barrier=False):
    """ONE table, the gather split into k independent index chunks —
    exploits the measured latency-bound overlap of independent gathers."""
    table = jax.random.normal(jax.random.PRNGKey(0), (T, C), dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)

    @jax.jit
    def f(idx, table):
        chunks = jnp.split(idx, k)
        outs = [jnp.take(table, c, axis=0) for c in chunks]
        if barrier:
            outs = [jax.lax.optimization_barrier(o) for o in outs]
        return jnp.concatenate(outs)

    dt = timeit(f, idx, table)
    rate = N / dt
    print(
        f"splt T=2^{int(np.log2(T)):2d} C={C:3d} {np.dtype(dtype).name:8s} "
        f"N=2^{int(np.log2(N)):2d} k={k:3d} bar={int(barrier)}: "
        f"{dt*1e3:7.2f} ms  {rate/1e6:8.1f} M rows/s  "
        f"{rate * C * np.dtype(dtype).itemsize / 1e9:6.1f} GB/s"
    )
    return rate


def bench_isolate(T, C, Nc, dtype, variant):
    """Isolate WHY 8 separate tables gather 8x faster than one:
    a. same table, 8 idx chunks, summed (N_out = Nc)
    b. 8 distinct tables, same idx, summed
    c. 8 distinct tables, distinct idx, concatenated (N_out = 8*Nc)
    """
    key = jax.random.PRNGKey(0)
    tables = [jax.random.normal(jax.random.fold_in(key, i), (T, C), dtype) for i in range(8)]
    idxs = [jax.random.randint(jax.random.fold_in(key, 100 + i), (Nc,), 0, T, jnp.int32) for i in range(8)]

    if variant == "a":
        @jax.jit
        def f(tbl, *idxs):
            return sum(jnp.take(tbl, ix, axis=0) for ix in idxs)
        args = (tables[0], *idxs)
        rows = 8 * Nc
    elif variant == "b":
        @jax.jit
        def f(ix, *tbls):
            return sum(jnp.take(tb, ix, axis=0) for tb in tbls)
        args = (idxs[0], *tables)
        rows = 8 * Nc
    else:
        @jax.jit
        def f(idxs, tbls):
            return jnp.concatenate([jnp.take(tb, ix, axis=0) for tb, ix in zip(tbls, idxs)])
        args = (idxs, tables)
        rows = 8 * Nc
    dt = timeit(f, *args)
    rate = rows / dt
    print(
        f"iso{variant} T=2^{int(np.log2(T)):2d} C={C:3d} {np.dtype(dtype).name:8s} "
        f"Nc=2^{int(np.log2(Nc)):2d}: {dt*1e3:7.2f} ms  {rate/1e6:8.1f} M rows/s"
    )
    return rate


def main():
    which = set(sys.argv[1:]) or {"xla", "pallas"}
    N = 1 << 20
    if "isolate" in which:
        for v in ("a", "b", "c"):
            bench_isolate(1 << 19, 32, 1 << 17, jnp.bfloat16, v)
        for v in ("a", "b"):
            bench_isolate(1 << 19, 32, 1 << 15, jnp.bfloat16, v)
    if "split" in which:
        for k in (8, 32, 128):
            bench_split(1 << 19, 32, N, jnp.bfloat16, k)
        bench_split(1 << 19, 32, N, jnp.bfloat16, 32, barrier=True)
        for k in (8, 32):
            bench_split(1 << 19, 8, N, jnp.float32, k)
        bench_split(1 << 16, 32, N, jnp.int8, 32)
        for nt in (16, 32):
            bench_xla(1 << 19, 32, N >> 3, jnp.bfloat16, n_tables=nt)
    if "xla" in which:
        for T in (1 << 16, 1 << 19):
            for C, dtype in ((32, jnp.float32), (32, jnp.bfloat16), (8, jnp.float32)):
                bench_xla(T, C, N, dtype)
        bench_xla(1 << 19, 32, N, jnp.float32, sort=True)
        bench_xla(1 << 19, 32, N >> 3, jnp.float32, n_tables=8)
        bench_xla(1 << 19, 32, N >> 3, jnp.bfloat16, n_tables=8)
    if "pallas" in which:
        for T in (1 << 13, 1 << 16):
            for dtype in (jnp.float32, jnp.bfloat16):
                try:
                    bench_pallas(T, 32, N, dtype)
                except Exception as e:
                    print(f"plas T=2^{int(np.log2(T))} {jnp.dtype(dtype).name}: "
                          f"FAILED {type(e).__name__}: {str(e)[:200]}")
    if "onehot" in which:
        bench_onehot(1 << 13, 32, 1 << 16, jnp.bfloat16)
        bench_onehot(1 << 16, 32, 1 << 16, jnp.bfloat16)


if __name__ == "__main__":
    main()

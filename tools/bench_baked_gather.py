"""Microbench: int32-row gather rate vs table size for the baked renderer.

The baked frame does ~4M-row gathers per round from a (K*(R+1)^3, 4) int32
table; this measures that primitive in isolation (loop-amortized in one jit,
tunnel-safe) across table sizes, plus the decode+MLP tail, to locate the
frame bottleneck.
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_gather(n_rows: int, n_idx: int, cols: int = 4, iters: int = 20):
    table = jnp.ones((n_rows, cols), jnp.int32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(table, key):
        def body(i, carry):
            acc, k = carry
            k, sub = jax.random.split(k)
            idx = jax.random.randint(sub, (n_idx,), 0, n_rows)
            r = jnp.take(table, idx, axis=0)
            return acc + r.sum(dtype=jnp.int32), k

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.int32(0), key))
        return acc

    r = run(table, key)
    int(r)  # sync
    t0 = time.time()
    r = run(table, key)
    int(r)
    dt = (time.time() - t0) / iters
    rate = n_idx / dt
    print(
        f"rows=2^{n_rows.bit_length()-1:2d} ({n_rows*cols*4/1e6:8.1f} MB) "
        f"idx=2^{n_idx.bit_length()-1} cols={cols}: {dt*1e3:8.2f} ms  "
        f"{rate/1e6:7.1f} M rows/s"
    )
    return rate


def bench_bits_probe(n_words4: int, n_idx: int, ndim: int, iters: int = 20,
                     variant: str = "row"):
    """The packed-bit cull probe in isolation: (rows,4) uint32 table gather
    + lane one-hot + bit test, at 1D vs the renderer's (rays, P) 2D index
    shape.  In-situ the cull runs ~200M probes/s where standalone row
    benches hit ~340M/s — this isolates whether the index shape is the
    difference."""
    import numpy as np

    from sienerf_tpu.ops.bits import lookup_bits, lookup_bits_word

    probe = lookup_bits_word if variant == "word" else lookup_bits

    words = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 32, size=(n_words4, 4), dtype=np.uint32)
    )
    n_bits = n_words4 * 128
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(words, key):
        def body(i, carry):
            acc, k = carry
            k, sub = jax.random.split(k)
            shape = (n_idx,) if ndim == 1 else (n_idx // 64, 64)
            flat = jax.random.randint(sub, shape, 0, n_bits)
            r = probe(words, flat)
            return acc + r.sum(dtype=jnp.int32), k

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.int32(0), key))
        return acc

    r = run(words, key)
    int(r)
    import time as _t

    t0 = _t.time()
    r = run(words, key)
    int(r)
    dt = (_t.time() - t0) / iters
    print(
        f"bits  rows4={n_words4} ({n_words4*16/1e6:6.1f} MB) ndim={ndim} {variant}: "
        f"{dt*1e3:8.2f} ms  {n_idx/dt/1e6:7.1f} M probes/s"
    )


def main():
    n_idx = 1 << 22
    for lg in (17, 20, 22, 23, 24, 25, 26):
        bench_gather(1 << lg, n_idx)
    # the actual baked table shape (3 cascades x 257^3)
    bench_gather(50923779, n_idx)
    # wider rows at the same byte count per sample as trilinear cells
    bench_gather(1 << 23, n_idx, cols=32, iters=5)
    # the candidate-cull bit probe (6.4 MB sidecar, renderer geometry)
    bench_bits_probe(398624, n_idx, 1)
    bench_bits_probe(398624, n_idx, 2)
    bench_bits_probe(398624, n_idx, 1, variant="word")
    bench_bits_probe(398624, n_idx, 2, variant="word")
    # the training occupancy table geometry (0.8 MB)
    bench_bits_probe(49152, n_idx, 2)
    bench_bits_probe(49152, n_idx, 2, variant="word")


if __name__ == "__main__":
    main()

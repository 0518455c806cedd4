"""Isolate the primitive costs inside the hash backward, layout-honest.

Every probe is ONE jit whose working arrays are BORN inside the jit (from
random bits), loop-amortized over ITERS with ONE scalar fetch — matching
the fused train step's conditions (no boundary materializations, no
per-leaf RTTs).  This answers, at N=2^18 / T=2^19:

  sort     — argsort of N int32 keys
  take32   — gather N rows of 32 f32 (the per-level contrib reorder)
  take128  — gather N rows of 128 f32 (padded-wide variant)
  seg32    — sorted-indices segment_sum into (T, 32)
  seg32u   — UNsorted segment_sum into (T, 32) (XLA scatter-add path)
  outer    — the w x g outer-product + reshape alone (VPU baseline)

Usage: python tools/probe_sortscatter.py [N] [ITERS]
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
T = 1 << 19


def loop(body):
    @jax.jit
    def run(key):
        def b(i, acc):
            return acc + body(jax.random.fold_in(key, i))

        return jax.lax.fori_loop(0, ITERS, b, jnp.float32(0.0))

    float(run(jax.random.PRNGKey(0)))  # compile+warm
    t0 = time.time()
    float(run(jax.random.PRNGKey(1)))
    return (time.time() - t0) / ITERS * 1e3


def keys_of(k):
    return jax.random.randint(k, (N,), 0, T, jnp.int32)


def main():
    print(f"# N={N} T={T} iters={ITERS}")

    def p_sort(k):
        o = jnp.argsort(keys_of(k))
        return o[0].astype(jnp.float32)

    def p_take(width):
        def f(k):
            vals = jax.random.normal(k, (N, width))
            o = jnp.argsort(keys_of(k))
            s = jnp.take(vals, o, axis=0)
            return s[0, 0]

        return f

    def p_seg(width, sorted_, dtype=jnp.float32, clustered=False):
        def f(k):
            vals = jax.random.normal(k, (N, width)).astype(dtype)
            if clustered:
                # occupancy-like clustering: samples hit a 1/8 subset of rows
                idx = jax.random.randint(k, (N,), 0, T // 8, jnp.int32) * 2
            else:
                idx = keys_of(k)
            if sorted_:
                o = jnp.argsort(idx)
                idx = jnp.take(idx, o)
                vals = jnp.take(vals, o, axis=0)
            out = jax.ops.segment_sum(vals, idx, num_segments=T,
                                      indices_are_sorted=sorted_)
            return out[0, 0].astype(jnp.float32)

        return f

    def p_outer(k):
        w = jax.random.normal(k, (N, 8))
        g = jax.random.normal(jax.random.fold_in(k, 1), (N, 4))
        c = (w[:, :, None] * g[:, None, :]).reshape(N, 32)
        return jnp.sum(c[:, 0])

    rows = [
        ("sort", p_sort),
        ("take32", p_take(32)),
        ("take128", p_take(128)),
        ("seg32(sorted, incl sort+take)", p_seg(32, True)),
        ("seg32(unsorted)", p_seg(32, False)),
        ("seg16(unsorted)", p_seg(16, False)),
        ("seg8(unsorted)", p_seg(8, False)),
        ("seg32bf16(unsorted)", p_seg(32, False, jnp.bfloat16)),
        ("seg16bf16(unsorted)", p_seg(16, False, jnp.bfloat16)),
        ("seg32(unsorted, clustered)", p_seg(32, False, clustered=True)),
        ("outer", p_outer),
    ]
    for name, fn in rows:
        try:
            dt = loop(fn)
            print(f"{name:32s} {dt:8.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()

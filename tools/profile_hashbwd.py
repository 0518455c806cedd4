"""Stage-decompose the hash-grid backward at train shapes on real TPU.

The r2 train profile attributes +157 ms/step to "grad" at 2^18 samples
(NOTES_ROUND2), with the hash scatter-add backward the suspected wall
(VERDICT r2 next #5).  This isolates the encode VJP and times its stages
separately so the countermeasure targets the measured cost, not the
suspected one.

TIMING GOTCHA (measured, this box): repeated jit calls with IDENTICAL
argument objects return cached results (~0.06 ms) instead of re-executing —
every rep here uses a distinct input object.

Usage: [N=262144] [REPS=8] python tools/profile_hashbwd.py
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
    HashGridConfig,
    _geometry_cell,
    _pad_features,
    _sorted_segment_accumulate,
    hashgrid_encode,
)

REPS = int(os.environ.get("REPS", "8"))


def _sync(out):
    """block_until_ready is NOT a reliable wait on the axon tunnel — force a
    real device->host fetch of one element from every output leaf."""
    for leaf in jax.tree.leaves(out):
        np.asarray(jax.lax.slice(leaf.reshape(-1), (0,), (1,)))


def timeit(name, fn, variants):
    """variants: list of arg-tuples, one per rep (distinct objects so the
    same-args result cache can't fire; fetch-synced — see _sync)."""
    out = fn(*variants[0])
    _sync(out)
    t0 = time.time()
    outs = [fn(*v) for v in variants[1:]]
    for o in outs:  # device stream executes in dispatch order; the fetches
        _sync(o)    # pay one tunnel RTT total once the stream has drained
    dt = (time.time() - t0) / (len(variants) - 1) * 1e3
    print(f"{name:10s} {dt:8.2f} ms")
    return dt


def main():
    N = int(os.environ.get("N", str(1 << 18)))
    cfg = HashGridConfig.from_network_config(
        {"otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
         "log2_hashmap_size": 19, "base_resolution": 16,
         "per_level_scale": 1.5}, aabb_scale=4.0,
    )
    poss = [jax.random.uniform(jax.random.PRNGKey(r), (N, 3)) for r in range(REPS)]
    L, F = cfg.n_levels, cfg.n_features_per_level
    C = 1 << cfg.n_dims
    T = cfg.table_size
    Fp = _pad_features(C, F)
    gs = [jax.random.normal(jax.random.PRNGKey(200 + r), (N, L * F)) for r in range(REPS)]
    print(f"# N={N} L={L} F={F} C={C} T={T} Fp={Fp} layout={cfg.layout} reps={REPS}")

    # NOTE: no fwd/vjp rows — passing the (L,T,C,F) table as a top-level jit
    # input provokes a T(8,128) tile-padded layout copy (64x -> 17 GB OOM on
    # this stack; training avoids it because the table lives inside one big
    # jit).  The backward's cost is entirely in the table-FREE stages below
    # (the fwd is known ~77 ms from the r2 train profile).
    geom = jax.jit(lambda p: _geometry_cell(cfg, p)[:2])
    timeit("geometry", geom, [(poss[r],) for r in range(REPS)])

    idxs, ws = zip(*[geom(poss[r]) for r in range(REPS)])
    glps = [
        jnp.pad(gs[r].reshape(N, L, F), ((0, 0), (0, 0), (0, Fp - F)))
        for r in range(REPS)
    ]

    def contrib_all(w_, glp_):
        return [
            (w_[:, l, :, None] * glp_[:, l, None, :]).reshape(N, C * Fp)
            for l in range(L)
        ]

    timeit("contrib", jax.jit(contrib_all),
           [(ws[r], glps[r]) for r in range(REPS)])

    def sort_all(idx_):
        return [jnp.argsort(idx_[:, l]) for l in range(L)]

    timeit("sort", jax.jit(sort_all), [(idxs[r],) for r in range(REPS)])

    orders = [jax.jit(sort_all)(idxs[r]) for r in range(REPS)]
    contribs = [jax.jit(contrib_all)(ws[r], glps[r]) for r in range(REPS)]

    def gather_all(contribs_, orders_):
        return [jnp.take(c, o, axis=0) for c, o in zip(contribs_, orders_)]

    timeit("gather", jax.jit(gather_all),
           [(contribs[r], orders[r]) for r in range(REPS)])

    sidxs = [
        [jnp.take(idxs[r][:, l], orders[r][l]) for l in range(L)]
        for r in range(REPS)
    ]
    svalss = [jax.jit(gather_all)(contribs[r], orders[r]) for r in range(REPS)]

    def segsum_all(svals_, sidx_):
        return [
            jax.ops.segment_sum(v, i, num_segments=T, indices_are_sorted=True)
            for v, i in zip(svals_, sidx_)
        ]

    timeit("segsum", jax.jit(segsum_all),
           [(svalss[r], sidxs[r]) for r in range(REPS)])

    def bwd_prod(idx_, w_, glp_):
        outs = []
        for l in range(L):
            contrib = (w_[:, l, :, None] * glp_[:, l, None, :]).reshape(N, C * Fp)
            outs.append(_sorted_segment_accumulate(contrib, idx_[:, l], T))
        return outs

    timeit("bwd_prod", jax.jit(bwd_prod),
           [(idxs[r], ws[r], glps[r]) for r in range(REPS)])


if __name__ == "__main__":
    main()

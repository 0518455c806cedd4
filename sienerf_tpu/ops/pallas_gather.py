"""Pallas DMA row-gather: manual HBM->VMEM async copies for random rows.

Why this exists: XLA's random row gather (`jnp.take(table, idx, axis=0)`)
is descriptor-limited and ALSO table-size penalized on TPU — measured
(tools/bench_baked_gather.py, v5e-1) at ~343 M rows/s for tables <= 2 MB
but a flat ~91 M rows/s plateau for any table >= 64 MB.  The baked feature
table (3 cascades x 257^3 x 16 B ~= 0.8 GB) gathers at the plateau, which
floors the baked renderer's fine-eval stage (NOTES_ROUND2.md perf model).

This kernel issues one DMA per row with a W-deep in-flight window (slot
b % W waits on its previous user before reuse), indices streamed to SMEM
per block — the double-buffering pattern from the Pallas TPU guide
generalized to a W-slot rotation.  If the plateau is a property of XLA's
gather lowering rather than the memory system, pipelined DMAs recover the
small-table rate on the big table; tools/bench_pallas_gather.py measures
exactly that A/B.

Reference behavior being accelerated: the per-sample feature fetch inside
NerfTracer::trace's network eval (tcnn hash gathers,
/root/reference/src/testbed_nerf.cu:2022-2145) — here against the baked
grid instead of the live hash table.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# Flip on to route baked_features' nearest-mode row gather through the DMA
# kernel (also settable via SIENERF_PALLAS_GATHER=1 before import).
USE_PALLAS_GATHER = os.environ.get("SIENERF_PALLAS_GATHER", "0") == "1"


@functools.partial(jax.jit, static_argnames=("block", "window", "interpret"))
def gather_rows(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    block: int = 512,
    window: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """`jnp.take(table, idx, axis=0)` via pipelined per-row DMAs.

    table: (V, C) any dtype; idx: (N,) int32 (clamped to [0, V-1]).
    Returns (N, C).  N is padded internally to a multiple of `block`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, C = table.shape
    (N,) = idx.shape
    B = block
    W = window
    assert B >= W
    pad = (-N) % B
    idx = jnp.clip(idx, 0, V - 1)
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    n_pad = N + pad

    def kernel(idx_ref, table_ref, out_ref, sems):
        def dma(b):
            i = idx_ref[b]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(i, 1)],
                out_ref.at[pl.ds(b, 1)],
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

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // B,),
        in_specs=[
            pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, C), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((W,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, table)
    return out[:N]


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas DMA gather when enabled (TPU backend only, 1-D idx),
    else XLA's jnp.take.  The baked renderer's row fetches funnel through
    here so one flag A/Bs the whole path."""
    if (
        USE_PALLAS_GATHER
        and idx.ndim == 1
        and table.ndim == 2
        and jax.default_backend() not in ("cpu",)
    ):
        return gather_rows(table, idx)
    return jnp.take(table, idx, axis=0)

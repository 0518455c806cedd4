"""Row-packed bit tables: the TPU-fast boolean probe primitive.

TPU random gathers are descriptor-limited at a fixed ROW rate (measured on
v5e, tools/bench_baked_gather.py): a 16-byte-row gather costs the same as a
scalar lookup but moves 4 uint32 words, and small tables gather ~2.5-4x
faster than big ones (near-core staging).  So boolean fields probed inside
march loops — the occupancy grid, the baked live-density sidecar — are
packed 128 bits to a (row, 4-lane) uint32 row: 32x smaller than a byte
mask AND row-gathered.  The training occupancy grid (3x128^3) packs to
~0.8 MB, firmly in the fast regime.

Reference behavior being accelerated: density-bitfield probes in the
DDA march (get_bitfield_at / if_unoccupied_advance_to_next_occupied_voxel,
/root/reference/src/nerf_device.cuh:424-494).
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_bits(keep: jnp.ndarray) -> jnp.ndarray:
    """(N,) bool -> (ceil(N/128), 4) uint32 rows; bit i of word w = flat id
    w*32+i, word w lives at [w >> 2, w & 3]."""
    n = keep.shape[0]
    pad = (-n) % 128
    k = jnp.pad(keep, (0, pad)).reshape(-1, 4, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(jnp.where(k, weights, jnp.uint32(0)), axis=2, dtype=jnp.uint32)


def lookup_bits(words: jnp.ndarray, flat: jnp.ndarray) -> jnp.ndarray:
    """Packed-bit test: flat bit ids -> bool.  One 16-byte row gather + an
    in-register one-hot lane select (a per-element minor-axis gather would
    serialize on TPU — NOTES_ROUND1 fact #3)."""
    w32 = flat >> 5
    rows = jnp.take(words, w32 >> 2, axis=0)  # (..., 4)
    lane = (w32 & 3)[..., None] == jnp.arange(4, dtype=jnp.int32)
    w = jnp.sum(jnp.where(lane, rows, jnp.uint32(0)), axis=-1, dtype=jnp.uint32)
    return ((w >> (flat & 31).astype(jnp.uint32)) & 1).astype(bool)


def lookup_bits_word(words: jnp.ndarray, flat: jnp.ndarray) -> jnp.ndarray:
    """Packed-bit test via ONE 4-byte word gather (no lane select).

    Candidate-cull probes along rays rarely share a 128-bit row (flat ids
    jump by ~Rv per step except along z), so the row variant's 16-byte
    gather + 4-lane one-hot select buys no sharing and pays ~3 extra VPU
    passes over (N, 4) lanes.  TPU gathers are descriptor-limited at a
    fixed ROW rate (4-byte rows gather as fast as 16-byte ones), so a
    direct word gather should match the gather cost and drop the select.
    A/B knob: SIENERF_BITS=word (tools/bench_baked_gather.py measures both).
    """
    w = jnp.take(words.reshape(-1), (flat >> 5).astype(jnp.int32), axis=0)
    return ((w >> (flat & 31).astype(jnp.uint32)) & 1).astype(bool)


def lookup_bits_auto(words: jnp.ndarray, flat: jnp.ndarray) -> jnp.ndarray:
    """Dispatch lookup_bits by SIENERF_BITS (row|word) — renderer A/B knob."""
    import os

    if os.environ.get("SIENERF_BITS", "row") == "word":
        return lookup_bits_word(words, flat)
    return lookup_bits(words, flat)

"""Multiresolution hash-grid encoding (tcnn "HashGrid"/"DenseGrid" equivalent).

This is the L0 workhorse of the whole framework (reference consumes it via
tiny-cuda-nn `Encoding<T>` with otype HashGrid — see configs/nerf/base.json
and SURVEY.md §2.3).  TPU-native design notes:

- All levels live in one `(n_levels, table_size, n_features)` HBM-resident
  fp32 table; lookups are ONE flat XLA gather over all levels at once and
  the backward is ONE flat scatter-add (custom VJP, with an analytic
  position gradient for camera optimisation / SDF analytic normals).
- **Per-level constants (scale, resolution, dense flag, level offset) are
  baked into the graph as numpy literals.**  This is load-bearing: feeding
  gather/scatter index math from traced scalars (e.g. `scales[l]` inside a
  `lax.scan`) pushes XLA:TPU onto a ~200x slower gather path (measured
  9.5ms vs 0.05ms for a 2M-row gather on v5e).  Unrolling levels in Python
  blows up compile time instead; vectorizing levels with literal constants
  gets both fast compile and fast execution (~9 Gsample/s fwd).

Semantics matched to tcnn so reference configs mean the same:
  scale_l   = base_resolution * per_level_scale**l - 1
  res_l     = ceil(scale_l) + 1
  pos_l     = pos * scale_l + 0.5 ;  corner = floor(pos_l), frac = pos_l - corner
  index     = dense stride if res_l**D <= table_size else
              (x * 1) ^ (y * 2654435761) ^ (z * 805459861)  (mod table_size)
Auto-sizing of per_level_scale from a desired finest resolution follows
reference src/testbed.cu:3929-3977.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861, 3674653429)

# A/B knob for the backward scatter design, resolved ONCE at import in
# non-traced Python (ADVICE r3: reading os.environ inside the traced
# _encode_bwd_impl froze the first-seen value into the jit cache — flipping
# it mid-process silently did nothing, the exact renderer-knob failure mode
# resolve_baked_knobs documents).  "bf16" is the round-4 measured winner:
# the TPU scatter unit runs 16-bit updates ~3.6x faster than 32-bit and
# ignores sortedness entirely (tools/probe_sortscatter.py), so the plain
# unsorted bf16 segment_sum beats the r1-r3 sorted-f32 design 131 vs 250
# ms/full-step @2^18 (NOTES_ROUND4 table; equivalence
# tests/test_hashgrid.py::test_bwd_bf16_mode_close; precision precedent:
# tcnn trains its hash tables with half-precision gradient accumulation).
import os as _os

HASH_BWD_MODE = _os.environ.get("SIENERF_HASH_BWD", "bf16")


@dataclass(frozen=True)
class HashGridConfig:
    n_dims: int = 3
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 2.0
    # "Hash" or "Dense"; Dense forces stride indexing at every level (tcnn DenseGrid)
    grid_type: str = "Hash"
    # Memory layout (TPU performance knob, same parameter budget either way):
    #  - "corner": tcnn-exact vertex-shared table (L, T, F); every sample
    #    issues 2^D narrow (F*4-byte) gathers per level.  Narrow random HBM
    #    gathers are descriptor-limited on TPU (~225M rows/s measured on
    #    v5e), making this layout ~8x slower.
    #  - "cell": one row per interpolation CELL holding all 2^D corner
    #    features contiguously (L, T/2^D, 2^D, F); one wide (2^D*F*4-byte)
    #    gather per level per sample (~379M rows/s measured).  Corner values
    #    are duplicated across neighboring cells, so C0 continuity is by
    #    training consistency rather than by construction — empirically
    #    matches corner-layout PSNR (see tests/test_hashgrid.py).
    layout: str = "cell"

    # Cell-layout rows: log2_hashmap_size counts ROWS (cells), matching the
    # vertex-table row count of the corner layout.  Parameters grow by 2^D
    # (corner features are duplicated per cell) — the collision rate is what
    # determines quality, and halving rows to save params measurably
    # destroys aabb>1 scenes (fox: occupancy never carves).
    @property
    def table_size(self) -> int:
        """Number of table rows (cells for cell layout, vertices otherwise)."""
        return 1 << self.log2_hashmap_size

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    def level_scale(self, level: int) -> float:
        return self.base_resolution * (self.per_level_scale**level) - 1.0

    def level_resolution(self, level: int) -> int:
        return int(math.ceil(self.level_scale(level))) + 1

    def level_is_dense(self, level: int) -> bool:
        if self.grid_type == "Dense":
            return True
        n_rows_needed = (
            max(self.level_resolution(level) - 1, 1) ** self.n_dims
            if self.layout == "cell"
            else self.level_resolution(level) ** self.n_dims
        )
        return n_rows_needed <= self.table_size

    @staticmethod
    def from_network_config(enc: dict, n_dims: int = 3, aabb_scale: float = 1.0) -> "HashGridConfig":
        """Build from a tcnn-style encoding dict, with NGP auto per_level_scale.

        Reference reset_network (testbed.cu:3929-3977): when the config omits
        per_level_scale it is derived so the finest level hits
        `2048 * aabb_scale` cells across the unit box.
        """
        n_levels = int(enc.get("n_levels", 16))
        base = int(enc.get("base_resolution", 16))
        if "per_level_scale" in enc:
            pls = float(enc["per_level_scale"])
        else:
            desired = 2048.0 * aabb_scale
            pls = float(np.exp(np.log(desired / base) / max(n_levels - 1, 1)))
        return HashGridConfig(
            n_dims=n_dims,
            n_levels=n_levels,
            n_features_per_level=int(enc.get("n_features_per_level", 2)),
            log2_hashmap_size=int(enc.get("log2_hashmap_size", 19)),
            base_resolution=base,
            per_level_scale=pls,
            grid_type="Dense" if enc.get("otype", "HashGrid").lower().startswith("dense") else "Hash",
            layout=enc.get("layout", "cell"),
        )


def init_hashgrid_params(key, config: HashGridConfig, dtype=jnp.float32):
    """tcnn initializes grid features uniform in [-1e-4, 1e-4]."""
    if config.layout == "cell":
        shape = (
            config.n_levels,
            config.table_size,
            1 << config.n_dims,
            config.n_features_per_level,
        )
    else:
        shape = (config.n_levels, config.table_size, config.n_features_per_level)
    return jax.random.uniform(key, shape, dtype, minval=-1e-4, maxval=1e-4)


def _pad_features(C: int, F: int) -> int:
    """Padded per-corner feature count: rows of C*Fp = 32 floats (128 bytes)
    hit the fast gather regime (379M rows/s measured) at 4x less table
    inflation than 512-byte rows; layouts stay sane because the per-level
    value arrays are only ~262k rows."""
    target = max(32 // C, 1)
    return max(F, target)


def _pad_cell_table(config: HashGridConfig, table: jnp.ndarray) -> jnp.ndarray:
    """(L, T, C, F) -> (L, T, 128) with zero-padded features.

    512-byte rows are the sweet spot for TPU HBM gathers (412M rows/s
    measured vs 225M at 16B), and 128-lane minor dims stop XLA from
    assigning transposed layouts to the surrounding elementwise ops (which
    otherwise force the backward scatter onto a serialized path).
    """
    L, T, C, F = table.shape
    Fp = _pad_features(C, F)
    if Fp != F:
        table = jnp.pad(table, ((0, 0), (0, 0), (0, 0), (0, Fp - F)))
    return table.reshape(L, T, C * Fp)


def _corner_offsets(n_dims: int) -> np.ndarray:
    """(2^D, D) binary corner offsets."""
    n = 1 << n_dims
    return np.array([[(c >> d) & 1 for d in range(n_dims)] for c in range(n)], np.uint32)


def _static_level_data(config: HashGridConfig):
    """All per-level constants as NUMPY arrays (become HLO literals)."""
    L, D = config.n_levels, config.n_dims
    scales = np.asarray([config.level_scale(l) for l in range(L)], np.float32)
    res = np.asarray([config.level_resolution(l) for l in range(L)], np.uint32)
    dense = np.asarray([config.level_is_dense(l) for l in range(L)], bool)
    # per-level, per-dim index multipliers: dense levels use strides
    # (1, res, res^2, ...), hash levels use the primes (uint32 wraparound ok).
    # Cell layout indexes CELLS (res-1 per dim) instead of vertices.
    mult = np.zeros((L, D), np.uint32)
    for l in range(L):
        if dense[l]:
            stride_base = int(res[l]) - 1 if config.layout == "cell" else int(res[l])
            s = 1
            for d in range(D):
                mult[l, d] = s % (1 << 32)
                s *= max(stride_base, 1)
        else:
            for d in range(D):
                mult[l, d] = _PRIMES[d] % (1 << 32)
    offsets = (np.arange(L, dtype=np.int64) * config.table_size).astype(np.int32)
    return scales, res, dense, mult, offsets


def _geometry(config: HashGridConfig, pos: jnp.ndarray):
    """Vectorized over levels AND corners, SAMPLE-MAJOR (N, L, ...) layout —
    keeping everything in the same order as the network activations avoids
    transposes whose layouts otherwise propagate into gathers/scatters and
    serialize them on TPU.

    Returns flat_idx (N*L*C,), w (N,L,C), per_dim (N,L,C,D), offs (C,D) np.
    """
    L, D = config.n_levels, config.n_dims
    C = 1 << D
    scales, res, dense, mult, lvl_off = _static_level_data(config)
    N = pos.shape[0]

    x = pos.astype(jnp.float32)[:, None, :] * scales[None, :, None] + 0.5  # (N,L,D)
    x_floor = jnp.floor(x)
    frac = x - x_floor  # (N,L,D)
    res_f = (res - 1).astype(np.float32)[None, :, None]
    base = jnp.clip(x_floor, 0.0, res_f).astype(jnp.uint32)  # (N,L,D)

    offs = _corner_offsets(D)  # (C,D) numpy
    res_m1 = (res - 1)[None, :, None]  # (1,L,1) numpy
    idx = None
    for d in range(D):
        corner_d = jnp.minimum(base[..., d][..., None] + offs[None, None, :, d], res_m1)  # (N,L,C)
        term = corner_d * mult[:, d][None, :, None]
        if idx is None:
            idx = term
        else:
            # dense levels accumulate strided sums, hash levels XOR; select
            # with the constant per-level mask
            dense_mask = dense[None, :, None]
            idx = jnp.where(dense_mask, idx + term, idx ^ term)
    idx = (idx & jnp.uint32(config.table_size - 1)).astype(jnp.int32)  # (N,L,C)
    flat_idx = (idx + lvl_off[None, :, None]).reshape(-1)

    f = frac[:, :, None, :]  # (N,L,1,D)
    per_dim = jnp.where(offs[None, None, :, :] == 1, f, 1.0 - f)  # (N,L,C,D)
    w = jnp.prod(per_dim, axis=-1)  # (N,L,C)
    return flat_idx, w, per_dim, offs, scales


def _sorted_segment_accumulate(values: jnp.ndarray, idx: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """Scatter-add `values` ((M, K)) into (n_rows, K) by row index.

    XLA:TPU serializes plain scatter-add when indices may collide (~160ms
    for 2.1M x 128B on v5e); sorting by index first and passing
    indices_are_sorted lets the scatter lower to the fast path (0.5ms
    measured) — PROVIDED the value array keeps its natural row-major
    layout, which is why the caller keeps everything sample-major and this
    function avoids transposing ops like cumsum/moveaxis.
    """
    order = jnp.argsort(idx)
    sidx = jnp.take(idx, order)
    svals = jnp.take(values, order, axis=0)
    return jax.ops.segment_sum(svals, sidx, num_segments=n_rows, indices_are_sorted=True)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def hashgrid_encode(config: HashGridConfig, table: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Encode positions. table: (L, T, F) fp32 (corner layout) or
    (L, T, C, F) (cell layout) — or either FLATTENED to 2-D (L, -1): the
    flat boundary layout exists because a (L, T, 4, 2) array tile-pads its
    minor dims up to 16x when it crosses a jit boundary every training
    step (ImageEngine at T=2^21 copied 68 GB/step — NOTES_ROUND4); a
    (L, T*C*F) boundary shape pads nothing and the in-graph reshape fuses
    into the per-level gather slices.  pos: (N, D) in [0,1]^D.

    Returns (N, L*F) float32 features (cast downstream as needed).
    """
    out, _ = _encode_fwd_impl(config, table, pos)
    return out


def _geometry_cell(config: HashGridConfig, pos: jnp.ndarray):
    """Cell-layout geometry: ONE index per (sample, level) — the containing
    interpolation cell — plus the same trilinear weights.  Sample-major.

    Returns flat_idx (N*L,), w (N,L,C), per_dim (N,L,C,D), offs, scales.
    """
    L, D = config.n_levels, config.n_dims
    scales, res, dense, mult, lvl_off = _static_level_data(config)
    N = pos.shape[0]

    x = pos.astype(jnp.float32)[:, None, :] * scales[None, :, None] + 0.5  # (N,L,D)
    x_floor = jnp.floor(x)
    frac = x - x_floor
    cell_max = np.maximum(res.astype(np.int64) - 2, 0).astype(np.float32)[None, :, None]
    base = jnp.clip(x_floor, 0.0, cell_max).astype(jnp.uint32)  # (N,L,D) cell coords

    idx = None
    for d in range(D):
        term = base[..., d] * mult[:, d][None, :]
        if idx is None:
            idx = term
        else:
            dense_mask = dense[None, :]
            idx = jnp.where(dense_mask, idx + term, idx ^ term)
    idx = (idx & jnp.uint32(config.table_size - 1)).astype(jnp.int32)  # (N,L)

    offs = _corner_offsets(D)
    f = frac[:, :, None, :]  # (N,L,1,D)
    per_dim = jnp.where(offs[None, None, :, :] == 1, f, 1.0 - f)  # (N,L,C,D)
    w = jnp.prod(per_dim, axis=-1)  # (N,L,C)
    return idx, w, per_dim, offs, scales


def _table4(config: HashGridConfig, table):
    """Canonical table view: reshape a flat 2-D (L, -1) boundary table back
    to (L, T, C, F) / (L, T, F) (free inside a jit graph)."""
    if table.ndim != 2:
        return table
    if config.layout == "cell":
        return table.reshape(config.n_levels, config.table_size,
                             1 << config.n_dims, config.n_features_per_level)
    return table.reshape(config.n_levels, config.table_size,
                         config.n_features_per_level)


def _encode_fwd_impl(config: HashGridConfig, table, pos):
    L, F = config.n_levels, config.n_features_per_level
    C = 1 << config.n_dims
    N = pos.shape[0]
    table_in, table = table, _table4(config, table)
    if config.layout == "cell":
        idx, w, _, _, _ = _geometry_cell(config, pos)
        # UNPADDED (C*F = 64B) rows for the forward gathers: at the 2^19-row
        # table size, 64B rows gather at 158.6M rows/s vs 99.7M for the
        # 128B-padded rows (measured on v5e; tools/profile_eval.py) — table
        # bytes, not row count, dominate once the level exceeds ~16MB.  The
        # 128B padding stays only where it is load-bearing: the backward
        # scatter layout (_encode_bwd_impl).
        #
        # Slice each LEVEL first, reshape per level: reshaping the whole
        # (L,T,C*F) table in one op lets XLA materialize it with minor-dim
        # tile padding (16 -> 128 lanes = 8x -> 17GB OOM in graphs where the
        # reshape isn't fused, e.g. the irradiance probe).  Per-level
        # worst-case materialization is ~268MB with temp reuse.
        # Per-level gathers are also ~4x faster than one merged gather from
        # the full multi-level table (measured 6.1ms vs 23.6ms, 2.1M rows).
        outs = []
        for l in range(L):
            tp_l = table[l].reshape(config.table_size, C * F)
            rows = jnp.take(tp_l, idx[:, l], axis=0)  # (N, C*F)
            cf = rows.reshape(N, C, F)
            outs.append(jnp.sum(cf * w[:, l, :, None], axis=1))  # (N,F)
        out = jnp.stack(outs, axis=1)  # (N,L,F)
    else:
        flat_idx, w, _, _, _ = _geometry(config, pos)
        cf = jnp.take(table.reshape(L * config.table_size, F), flat_idx, axis=0)  # (N*L*C, F)
        wf = cf * w.reshape(-1, 1)
        out = wf.reshape(N, L, C, F).sum(axis=2)  # (N,L,F)
    out = out.reshape(N, L * F)
    return out, (table_in, pos)


def _encode_bwd_impl(config: HashGridConfig, residuals, g):
    table, pos = residuals
    table_in, table = table, _table4(config, table)
    g = g.astype(jnp.float32)
    L, F = config.n_levels, config.n_features_per_level
    D = config.n_dims
    C = 1 << D
    N = pos.shape[0]
    T = config.table_size

    gl = g.reshape(N, L, F)
    if config.layout == "cell":
        idx, w, per_dim, offs, scales = _geometry_cell(config, pos)
        Fp = _pad_features(C, F)
        glp = jnp.pad(gl, ((0, 0), (0, 0), (0, Fp - F)))  # (N,L,Fp)
        tp = _pad_cell_table(config, table)
        if HASH_BWD_MODE == "batched":
            # ONE batched sort + ONE flat segment_sum instead of L
            # sequential (argsort, scatter) pairs.  MEASURED LOSER on the
            # real chip (campaign3: +grad 450.7 ms vs per-level 233.4 at
            # 2^18 samples) — one (L,N)-batched sort + (L*N, C*Fp) gather
            # moves far more bytes than 16 small sorts save in latency.
            # Kept as the A/B knob; per-level is the default.
            # Transpose the *inputs* (w: (N,L,C), glp: (N,L,Fp)) before the
            # outer product — transposing the (N,L,C*Fp) product would move
            # 4x the bytes.
            idxT = idx.T  # (L,N)
            order = jnp.argsort(idxT, axis=1)  # batched sort
            sidx = jnp.take_along_axis(idxT, order, axis=1)  # (L,N)
            wT = jnp.moveaxis(w, 1, 0)  # (L,N,C)
            gT = jnp.moveaxis(glp, 1, 0)  # (L,N,Fp)
            contribT = (wT[..., None] * gT[:, :, None, :]).reshape(L, N, C * Fp)
            svals = jnp.take_along_axis(contribT, order[:, :, None], axis=1)
            lvl_off = (np.arange(L, dtype=np.int64) * T).astype(np.int32)
            flat = (sidx + lvl_off[:, None]).reshape(-1)  # globally sorted
            d_flat = jax.ops.segment_sum(
                svals.reshape(L * N, C * Fp), flat,
                num_segments=L * T, indices_are_sorted=True,
            )
            d_table = d_flat.reshape(L, T, C, Fp)[..., :F]
        elif HASH_BWD_MODE == "skip":
            # attribution probe: zero table gradient (training would diverge;
            # measurement-only — full-step time with this mode isolates the
            # scatter-add's share of the grad wall)
            d_table = jnp.zeros((L, T, C, F), jnp.float32)
        elif HASH_BWD_MODE == "bf16":
            # bf16 unsorted scatter-add: the TPU scatter unit runs 16-bit
            # updates ~3.6x faster than f32 (5.6 vs 19.8 ms at these shapes,
            # tools/probe_sortscatter.py) and sortedness doesn't matter —
            # the argsort+take reorder (the r1-r3 design) is pure overhead
            # on this stack.  Precision: each contribution rounds to bf16
            # and collisions accumulate in bf16 — the reference's tcnn
            # trains its hash tables with HALF-precision gradient
            # accumulation the same way (loss-scaled fp16; bf16 needs no
            # loss scale).  Equivalence + quality: tests/test_hashgrid.py
            # ::test_bwd_bf16_mode_close, A/B'd on fox (NOTES_ROUND4).
            d_levels = []
            for l in range(L):
                contrib = (
                    (w[:, l, :, None] * glp[:, l, None, :])
                    .reshape(N, C * Fp).astype(jnp.bfloat16)
                )
                d_l = jax.ops.segment_sum(contrib, idx[:, l], num_segments=T)
                d_levels.append(d_l.reshape(T, C, Fp)[..., :F])
            d_table = jnp.stack(d_levels, axis=0).astype(jnp.float32)
        elif HASH_BWD_MODE == "nosort":
            # plain unsorted scatter-add (the historically-serialized XLA
            # path; kept as an A/B probe of the current compiler)
            d_levels = []
            for l in range(L):
                contrib = (w[:, l, :, None] * glp[:, l, None, :]).reshape(N, C * Fp)
                d_l = jax.ops.segment_sum(contrib, idx[:, l], num_segments=T)
                d_levels.append(d_l.reshape(T, C, Fp)[..., :F])
            d_table = jnp.stack(d_levels, axis=0)
        elif HASH_BWD_MODE == "postsort":
            # reorder the SMALL per-sample payload (w: C floats, glp: Fp)
            # instead of the C*Fp contribution rows — 32 -> 12 floats of
            # gather traffic per sample; the outer product then runs on
            # sorted data and fuses into the scatter's update computation
            d_levels = []
            for l in range(L):
                order = jnp.argsort(idx[:, l])
                sidx = jnp.take(idx[:, l], order)
                sw = jnp.take(w[:, l], order, axis=0)          # (N, C)
                sg = jnp.take(glp[:, l], order, axis=0)        # (N, Fp)
                contrib = (sw[:, :, None] * sg[:, None, :]).reshape(N, C * Fp)
                d_l = jax.ops.segment_sum(
                    contrib, sidx, num_segments=T, indices_are_sorted=True
                )
                d_levels.append(d_l.reshape(T, C, Fp)[..., :F])
            d_table = jnp.stack(d_levels, axis=0)
        else:
            d_levels = []
            for l in range(L):
                contrib = (w[:, l, :, None] * glp[:, l, None, :]).reshape(N, C * Fp)
                d_l = _sorted_segment_accumulate(contrib, idx[:, l], T)
                d_levels.append(d_l.reshape(T, C, Fp)[..., :F])
            d_table = jnp.stack(d_levels, axis=0)
        # corner features for the position gradient: when pos is not
        # differentiated (no camera/distortion optimization) XLA dead-code
        # eliminates this gather and the whole d_pos chain below
        cf_levels = [
            jnp.take(tp[l], idx[:, l], axis=0).reshape(N, C, Fp)[..., :F]
            for l in range(L)
        ]
        cf = jnp.stack(cf_levels, axis=1)  # (N,L,C,F)
    else:
        flat_idx, w, per_dim, offs, scales = _geometry(config, pos)
        contrib = (w[..., None] * gl[:, :, None, :]).reshape(-1, F)  # (N*L*C, F)
        d_table = _sorted_segment_accumulate(contrib, flat_idx, L * T).reshape(L, T, F)
        cf = jnp.take(table.reshape(L * T, F), flat_idx, axis=0).reshape(N, L, C, F)

    # position gradient (shared formula; all (N,L,C) shaped)
    fdotg = jnp.sum(cf * gl[:, :, None, :], axis=-1)  # (N,L,C)
    sign = np.where(offs == 1, 1.0, -1.0).astype(np.float32)  # (C,D)
    d_pos = jnp.zeros((N, D), jnp.float32)
    for d in range(D):
        others = [k for k in range(D) if k != d]
        prod_others = jnp.prod(per_dim[..., others], axis=-1) if others else jnp.ones_like(w)
        dw = sign[None, None, :, d] * prod_others * scales[None, :, None]  # (N,L,C)
        d_pos = d_pos.at[:, d].add(jnp.sum(fdotg * dw, axis=(1, 2)))
    return d_table.reshape(table_in.shape), d_pos.astype(pos.dtype)


hashgrid_encode.defvjp(_encode_fwd_impl, _encode_bwd_impl)


def hashgrid_stats(config: HashGridConfig, table, n_bins: int = 32):
    """Per-level weight statistics + histograms (reference LevelStats,
    testbed.h:446-460; gather_histograms testbed.cu:5169-5218)."""
    import numpy as np

    t = np.asarray(table)
    stats = []
    for l in range(config.n_levels):
        x = t[l].reshape(-1)
        hist, edges = np.histogram(x, bins=n_bins)
        stats.append(
            dict(
                level=l,
                resolution=config.level_resolution(l),
                mean=float(x.mean()),
                std=float(x.std()),
                min=float(x.min()),
                max=float(x.max()),
                frac_zero=float((np.abs(x) < 1e-7).mean()),
                histogram=hist.tolist(),
                bin_edges=edges.tolist(),
            )
        )
    return stats


# --- render-path packed tables ------------------------------------------

def pack_table_bf16(config: HashGridConfig, table: jnp.ndarray) -> jnp.ndarray:
    """Pack the fp32 cell table into bf16 pairs bitcast as fp32 rows:
    (L, T, C, F) -> (L, T, C*F//2) float32, each holding 2 bf16 features.

    Render-only: 32-byte rows make each level's table 16.7MB (vs 33.5MB
    unpadded fp32), which gathers at ~198M rows/s vs ~158M (measured,
    tools/profile_eval.py) — raw bf16-typed gathers are SLOWER (~89M/s), so
    the table is bitcast to fp32 for the gather and bitcast back after.
    """
    assert config.layout == "cell"
    L, C, F = config.n_levels, 1 << config.n_dims, config.n_features_per_level
    assert (C * F) % 2 == 0
    # NOTE: only use inside a jit that consumes the result (render_frame /
    # render_frame_multichip are proven).  Eager packing materializes
    # tile-padded intermediates (30-60x inflation -> OOM).
    t16 = table.reshape(L, config.table_size, C * F).astype(jnp.bfloat16)
    return jax.lax.bitcast_convert_type(
        t16.reshape(L, config.table_size, C * F // 2, 2), jnp.float32
    )


def hashgrid_encode_bf16(config: HashGridConfig, packed: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Forward-only encode from a pack_table_bf16 table (render path)."""
    L, F = config.n_levels, config.n_features_per_level
    C = 1 << config.n_dims
    N = pos.shape[0]
    idx, w, _, _, _ = _geometry_cell(config, pos)
    outs = []
    for l in range(L):
        rows = jnp.take(packed[l], idx[:, l], axis=0)  # (N, C*F//2) f32
        cf16 = jax.lax.bitcast_convert_type(rows, jnp.bfloat16)  # (N, C*F//2, 2)
        cf = cf16.reshape(N, C, F).astype(jnp.float32)
        outs.append(jnp.sum(cf * w[:, l, :, None], axis=1))
    return jnp.stack(outs, axis=1).reshape(N, L * F)


def pack_table_fp8(config: HashGridConfig, table: jnp.ndarray):
    """Pack the fp32 cell table into per-level-scaled e4m3 quads bitcast as
    fp32 rows: (L, T, C, F) -> ((L, T, C*F//4) float32, (L,) scales).

    Render-only quantization: for the 8-level x 4-feature reference config
    the bf16 rows are 64B -> 33.5MB/level, past the ~16MB HBM-gather knee
    (NOTES_ROUND1: 16MB tables gather ~2x faster than 33-67MB).  e4m3 halves
    the row to 32B -> 16.7MB/level.  Per-level absmax scaling keeps the
    ~6% e4m3 relative precision centered on the trained feature range;
    PSNR cost is measured (tools/sweep_render.py), not assumed.
    """
    assert config.layout == "cell"
    L, C, F = config.n_levels, 1 << config.n_dims, config.n_features_per_level
    assert (C * F) % 4 == 0
    t = table.reshape(L, config.table_size, C * F)
    scale = jnp.maximum(jnp.max(jnp.abs(t), axis=(1, 2)), 1e-8) / 448.0  # (L,)
    t8 = (t / scale[:, None, None]).astype(jnp.float8_e4m3fn)
    packed = jax.lax.bitcast_convert_type(
        t8.reshape(L, config.table_size, C * F // 4, 4), jnp.float32
    )
    return packed, scale


def hashgrid_encode_fp8(config: HashGridConfig, packed: jnp.ndarray, scale: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Forward-only encode from a pack_table_fp8 table (render path).

    Accepts the packed rows under any level RELABELING with the same
    linear order (render-only snapshots quantize with Lq <= L coarser
    per-level-scale groups; a C-order reshape maps quant level q onto
    config levels [q*r, (q+1)*r), so the scales expand by repeat)."""
    L, F = config.n_levels, config.n_features_per_level
    C = 1 << config.n_dims
    N = pos.shape[0]
    packed = packed.reshape(L, config.table_size, (C * F) // 4)
    if scale.shape[0] != L:
        scale = jnp.repeat(scale, L // scale.shape[0])
    idx, w, _, _, _ = _geometry_cell(config, pos)
    scale_np = scale  # (L,) traced; broadcast per level below
    outs = []
    for l in range(L):
        rows = jnp.take(packed[l], idx[:, l], axis=0)  # (N, C*F//4) f32
        cf8 = jax.lax.bitcast_convert_type(rows, jnp.float8_e4m3fn)  # (N, C*F//4, 4)
        cf = cf8.reshape(N, C, F).astype(jnp.float32) * scale_np[l]
        outs.append(jnp.sum(cf * w[:, l, :, None], axis=1))
    return jnp.stack(outs, axis=1).reshape(N, L * F)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def hashgrid_encode_bf16train(
    config: HashGridConfig, table: jnp.ndarray, pos: jnp.ndarray
) -> jnp.ndarray:
    """TRAINING encode that gathers bf16-packed rows from the fp32 master.

    Straight-through: the forward packs the fp32 table to bf16-pair rows
    (half the gather bytes — the 1.5x render-path win, see pack_table_bf16)
    and reads those; the backward is the EXACT fp32 custom vjp
    (_encode_bwd_impl), so gradients land on the fp32 master untouched
    (the reference trains its hash tables in fp16 with an fp32 Adam master
    the same way — tcnn GradientDescent precision_t vs float params).
    The per-step pack is an elementwise O(table) pass, negligible next to
    the O(N*L) gathers.  A/B knob: SIENERF_TRAIN_PACK=bf16 (engine create).
    """
    return hashgrid_encode_bf16(config, pack_table_bf16(config, table), pos)


def _encode_bf16train_fwd(config: HashGridConfig, table, pos):
    out = hashgrid_encode_bf16(config, pack_table_bf16(config, table), pos)
    return out, (table, pos)


hashgrid_encode_bf16train.defvjp(_encode_bf16train_fwd, _encode_bwd_impl)

"""Multi-cascade occupancy grid for empty-space skipping.

Behavioral spec: reference testbed_nerf.cu:74-332, 2772-2881
(`update_density_grid_nerf`, `grid_to_bitfield`, `bitfield_max_pool`,
`mark_untrained_density_grid`) and nerf_device.cuh:24-46 constants.

Semantics preserved:
- `n_cascades` grids of 128^3 cells; cascade m covers the box of side 2^m
  centered at (0.5,)^3 (cascade 0 = unit cube).
- Cells store EMA'd optical thickness `activated_density * MIN_CONE_STEPSIZE`
  (decay 0.95); threshold for occupancy = min(mean_density, 0.01).
- Coarser cascades additionally OR in a 2x max-pool of the finer cascade's
  center region.
- Cells never seen by any training camera are pinned to -1 (untrained).

TPU design: the grid is a dense `(C,128,128,128)` fp32 pytree leaf; updates
are one fused jit (sample positions -> density MLP -> scatter-max -> EMA ->
threshold -> pooling).  Dense refresh every `dense_interval` updates plays
the role of the reference's nonuniform occupied-cell resampling (which
needs dynamic compaction that TPUs dislike); uniform sampling covers the
rest of the time.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sienerf_tpu.common import NERF_GRIDSIZE, NERF_MIN_OPTICAL_THICKNESS, MIN_CONE_STEPSIZE


def n_cascades_for_aabb_scale(aabb_scale: float) -> int:
    return 1 + max(0, int(math.ceil(math.log2(max(aabb_scale, 1.0)))))


@dataclass(frozen=True)
class OccupancyConfig:
    n_cascades: int = 1
    decay: float = 0.95
    grid_size: int = NERF_GRIDSIZE


def init_occupancy_state(config: OccupancyConfig) -> dict:
    g = config.grid_size
    c = config.n_cascades
    return {
        # density EMA; <0 means untrained/unseeable cell
        "density": jnp.zeros((c, g, g, g), jnp.float32),
        "bitfield": jnp.zeros((c, g, g, g), jnp.bool_),
        "mean_density": jnp.zeros((), jnp.float32),
        "n_updates": jnp.zeros((), jnp.int32),
    }


def cell_center(idx_xyz: jnp.ndarray, mip, grid_size: int = NERF_GRIDSIZE) -> jnp.ndarray:
    """Grid index (...,3) + mip -> world position of cell center."""
    scale = jnp.exp2(jnp.asarray(mip, jnp.float32))[..., None]
    return ((idx_xyz.astype(jnp.float32) + 0.5) / grid_size - 0.5) * scale + 0.5


def pos_to_cell(pos: jnp.ndarray, mip, grid_size: int = NERF_GRIDSIZE) -> jnp.ndarray:
    """World position (...,3) -> integer grid coords at cascade `mip` (unclamped)."""
    scale = jnp.exp2(jnp.asarray(mip, jnp.float32))
    if scale.ndim == pos.ndim - 1:
        scale = scale[..., None]
    rel = (pos - 0.5) / scale + 0.5
    return jnp.floor(rel * grid_size).astype(jnp.int32)


def mip_from_pos(pos: jnp.ndarray, n_cascades: int) -> jnp.ndarray:
    """Smallest cascade whose box contains pos (nerf_device.cuh mip_from_pos)."""
    d = jnp.max(jnp.abs(pos - 0.5), axis=-1)
    # cascade m spans half-width 2^(m-1); need 2^(m-1) > d  =>  m = ceil(log2(2d)) for d>0.5
    exponent = jnp.ceil(jnp.log2(jnp.maximum(2.0 * d, 1e-10)))
    return jnp.clip(exponent, 0, n_cascades - 1).astype(jnp.int32)


def mip_from_dt(dt: jnp.ndarray, n_cascades: int, grid_size: int = NERF_GRIDSIZE) -> jnp.ndarray:
    """Coarsest cascade whose voxels are at least dt wide."""
    exponent = jnp.ceil(jnp.log2(jnp.maximum(dt * grid_size, 1e-10)))
    return jnp.clip(exponent, 0, n_cascades - 1).astype(jnp.int32)


def occupancy_lookup(state_bitfield: jnp.ndarray, pos: jnp.ndarray, mip: jnp.ndarray) -> jnp.ndarray:
    """bitfield: (C,G,G,G) bool; pos (...,3); mip (...,) -> occupied (...,) bool.

    Out-of-grid positions report unoccupied.  One-off probe; march loops
    should pack once (pack_occupancy) and probe the rows instead — scalar
    bool gathers run ~2.5x slower than 16-byte-row bit probes (measured,
    profile_baked_round '+bits' stage).
    """
    g = state_bitfield.shape[1]
    cell = pos_to_cell(pos, mip, g)
    inb = jnp.all((cell >= 0) & (cell < g), axis=-1)
    cc = jnp.clip(cell, 0, g - 1)
    flat = state_bitfield.reshape(-1)
    c_stride = g * g * g
    idx = mip * c_stride + (cc[..., 0] * g + cc[..., 1]) * g + cc[..., 2]
    return jnp.take(flat, idx) & inb


def pack_occupancy(state_bitfield: jnp.ndarray) -> jnp.ndarray:
    """(C,G,G,G) bool -> row-packed uint32 probe table (ops/bits.py layout).

    3x128^3 packs to ~0.8 MB — the near-core gather regime.  Packing is one
    elementwise pass over the grid (~sub-ms), amortized over a march loop's
    iters x rays probes."""
    from sienerf_tpu.ops.bits import pack_bits

    return pack_bits(state_bitfield.reshape(-1))


def occupancy_lookup_packed(
    words: jnp.ndarray, grid_size: int, pos: jnp.ndarray, mip: jnp.ndarray
) -> jnp.ndarray:
    """Packed-row sibling of occupancy_lookup (identical semantics)."""
    from sienerf_tpu.ops.bits import lookup_bits_auto

    g = grid_size
    cell = pos_to_cell(pos, mip, g)
    inb = jnp.all((cell >= 0) & (cell < g), axis=-1)
    cc = jnp.clip(cell, 0, g - 1)
    c_stride = g * g * g
    idx = mip * c_stride + (cc[..., 0] * g + cc[..., 1]) * g + cc[..., 2]
    return lookup_bits_auto(words, idx) & inb


def mark_untrained_cells(
    config: OccupancyConfig,
    xforms: np.ndarray,
    focal_lengths: np.ndarray,
    resolutions: np.ndarray,
) -> jnp.ndarray:
    """(C,G,G,G) bool mask of cells visible from >=1 training camera.

    Reference mark_untrained_density_grid (testbed_nerf.cu:74-146): a cell is
    trainable if its center (conservatively inflated by half a diagonal)
    projects inside some camera's image plane in front of the camera.
    """
    g = config.grid_size
    idx = np.stack(np.meshgrid(np.arange(g), np.arange(g), np.arange(g), indexing="ij"), axis=-1)
    masks = []
    xforms = np.asarray(xforms, np.float32)
    R = xforms[:, :3, :3]  # (N,3,3) columns are camera axes
    t = xforms[:, :3, 3]  # (N,3)
    for m in range(config.n_cascades):
        centers = ((idx + 0.5) / g - 0.5) * (2.0**m) + 0.5  # (g,g,g,3)
        half_diag = 0.5 * math.sqrt(3.0) * (2.0**m) / g
        pts = centers.reshape(-1, 3)
        visible = np.zeros(pts.shape[0], bool)
        for ci in range(xforms.shape[0]):
            rel = pts - t[ci]  # world offset
            cam = rel @ R[ci]  # into camera frame (columns orthonormal)
            z = cam[:, 2]
            fx, fy = focal_lengths[ci]
            w, h = resolutions[ci] if resolutions.ndim > 1 else resolutions
            margin = half_diag
            with np.errstate(divide="ignore", invalid="ignore"):
                x = cam[:, 0] / np.maximum(z, 1e-9)
                y = cam[:, 1] / np.maximum(z, 1e-9)
            vis = (
                (z + margin > 0.0)
                & (np.abs(x) * fx <= 0.5 * w + margin * fx / np.maximum(z, 1e-9) + 1)
                & (np.abs(y) * fy <= 0.5 * h + margin * fy / np.maximum(z, 1e-9) + 1)
            )
            visible |= vis
            if visible.all():
                break
        masks.append(visible.reshape(g, g, g))
    return jnp.asarray(np.stack(masks))


def _eval_chunked(fn, x: jnp.ndarray, chunk: int = 1 << 18) -> jnp.ndarray:
    """Apply fn over x in fixed chunks via lax.map (compile the body once —
    a single 2M-point fused graph makes XLA compile times explode)."""
    n = x.shape[0]
    if n <= chunk:
        return fn(x)
    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    out = jax.lax.map(fn, xp.reshape(n_chunks, chunk, x.shape[1]))
    return out.reshape(-1)[:n]


def _sample_cell_positions(key, cascade: int, cell_idx: jnp.ndarray, grid_size: int):
    """Random position inside each cell of `cascade`. cell_idx: (M,3) int."""
    u = jax.random.uniform(key, cell_idx.shape)
    scale = 2.0**cascade
    return ((cell_idx.astype(jnp.float32) + u) / grid_size - 0.5) * scale + 0.5


def update_density_grid(
    config: OccupancyConfig,
    state: dict,
    density_fn,
    key,
    aabb_min: jnp.ndarray,
    aabb_diag: jnp.ndarray,
    visible_mask: jnp.ndarray | None = None,
    dense: bool = False,
    n_samples_per_cascade: int = NERF_GRIDSIZE**3 // 4,
):
    """One occupancy update.  density_fn: (M,3) unit-warped pos -> activated density.

    Returns new state.  `dense=True` refreshes every cell (used for the first
    256 steps and periodically after, standing in for the reference's
    occupied-cell resampling).
    """
    g = config.grid_size
    c = config.n_cascades
    n_cells = g * g * g
    density = state["density"]

    if dense:
        keys = jax.random.split(key, c)
        new_vals = []
        for m in range(c):
            idx = jnp.stack(
                jnp.meshgrid(jnp.arange(g), jnp.arange(g), jnp.arange(g), indexing="ij"), axis=-1
            ).reshape(-1, 3)
            pos = _sample_cell_positions(keys[m], m, idx, g)
            unit = (pos - aabb_min) / aabb_diag
            d = _eval_chunked(density_fn, unit) * MIN_CONE_STEPSIZE
            new_vals.append(d.reshape(g, g, g))
        splat = jnp.stack(new_vals)
        density = jnp.maximum(density * config.decay, splat)
    else:
        keys = jax.random.split(key, 2 * c)
        density = density * config.decay
        for m in range(c):
            kidx, kpos = keys[2 * m], keys[2 * m + 1]
            flat_idx = jax.random.randint(kidx, (n_samples_per_cascade,), 0, n_cells)
            idx3 = jnp.stack([flat_idx // (g * g), (flat_idx // g) % g, flat_idx % g], axis=-1)
            pos = _sample_cell_positions(kpos, m, idx3, g)
            unit = (pos - aabb_min) / aabb_diag
            d = _eval_chunked(density_fn, unit) * MIN_CONE_STEPSIZE
            dm = density[m].reshape(-1)
            # sorted segment-max: plain scatter-max serializes on TPU when
            # indices may collide (see hashgrid._sorted_segment_accumulate)
            order = jnp.argsort(flat_idx)
            splat = jax.ops.segment_max(
                jnp.take(d, order),
                jnp.take(flat_idx, order),
                num_segments=n_cells,
                indices_are_sorted=True,
            )
            dm = jnp.maximum(dm, splat)
            density = density.at[m].set(dm.reshape(g, g, g))

    density, bitfield, mean_density = density_to_bitfield(density, visible_mask)
    return {
        "density": density,
        "bitfield": bitfield,
        "mean_density": mean_density,
        "n_updates": state["n_updates"] + 1,
    }


def density_to_bitfield(density: jnp.ndarray, visible_mask=None):
    """(C,G,G,G) density -> (masked density, bitfield, mean) — the
    mean-threshold + cascade max-pool tail of the grid update
    (update_density_grid_mean_and_bitfield, testbed_nerf.cu:2863-2881).
    Also used to rebuild occupancy from imported reference snapshots."""
    c, g = density.shape[0], density.shape[1]
    if visible_mask is not None:
        density = jnp.where(visible_mask, density, -1.0)

    mean_density = jnp.mean(jnp.maximum(density[0], 0.0))
    thresh = jnp.minimum(mean_density, NERF_MIN_OPTICAL_THICKNESS)
    bitfield = density > thresh

    # bitfield_max_pool: OR the finer cascade's 2x-pooled grid into the
    # center half of the next coarser cascade.
    for m in range(c - 1):
        fine = bitfield[m]
        pooled = fine.reshape(g // 2, 2, g // 2, 2, g // 2, 2).any(axis=(1, 3, 5))
        q = g // 4
        region = jax.lax.dynamic_slice(bitfield[m + 1], (q, q, q), (g // 2, g // 2, g // 2))
        merged = region | pooled
        bitfield = bitfield.at[m + 1].set(
            jax.lax.dynamic_update_slice(bitfield[m + 1], merged, (q, q, q))
        )
    return density, bitfield, mean_density


def occupied_bbox(bitfield: jnp.ndarray) -> tuple:
    """Tight world-space AABB of all occupied cells across cascades.

    The reference advances each camera ray to the first occupied voxel at
    init (advance_pos_nerf_kernel, testbed_nerf.cu:364); clamping ray entry
    to this box removes most of that empty lead-in for free (measured: the
    first ~2 render rounds per ray otherwise evaluate at fill~0).

    Returns (lo (3,), hi (3,)); lo > hi when the grid is fully empty.
    """
    C, G = bitfield.shape[0], bitfield.shape[1]
    idx = jnp.arange(G, dtype=jnp.float32)
    los, his = [], []
    for c in range(C):  # cascades are a static small count
        span = float(2 ** c)  # cascade half-extent is span/2 around 0.5
        occ = bitfield[c]
        cell = span / G
        lo_c, hi_c = [], []
        for ax in range(3):
            axes = tuple(a for a in range(3) if a != ax)
            line = jnp.any(occ, axis=axes)  # (G,)
            big = jnp.float32(G)
            first = jnp.min(jnp.where(line, idx, big))
            last = jnp.max(jnp.where(line, idx, -1.0))
            lo_c.append((0.5 - span / 2) + first * cell)
            hi_c.append((0.5 - span / 2) + (last + 1.0) * cell)
        los.append(jnp.stack(lo_c))
        his.append(jnp.stack(hi_c))
    lo = jnp.min(jnp.stack(los), axis=0)
    hi = jnp.max(jnp.stack(his), axis=0)
    return lo, hi


def ray_box_times(o: jnp.ndarray, d: jnp.ndarray, lo, hi) -> tuple:
    """Slab test: entry/exit t of rays (o + t*d) against box [lo, hi]."""
    safe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    ta = (lo[None, :] - o) / safe
    tb = (hi[None, :] - o) / safe
    tmin = jnp.max(jnp.minimum(ta, tb), axis=-1)
    tmax = jnp.min(jnp.maximum(ta, tb), axis=-1)
    return tmin, tmax


def bake_fine_bitfield(
    density_apply,
    params,
    coarse_bitfield,
    mean_density: float,
    factor: int = 4,
    dilate: bool = True,
    chunk: int = 1 << 20,
):
    """Bake a render-time occupancy bitfield at `factor`x the training grid
    resolution by evaluating the CURRENT network density at the fine-voxel
    centers of every occupied coarse cell.

    Rationale (round-2 perf work): the reference's 128^3 training grid
    (testbed_nerf.cu update_density_grid) is conservative — on fox at 768
    steps most marched samples carry near-zero density, and every sample
    costs a full hash-encode + MLP.  A finer RENDER-ONLY grid culls those
    samples before they reach the field eval; the training grid and its EMA
    machinery stay untouched (the fine grid is a pure bake of the trained
    density, refreshed whenever the caller re-bakes).  Same threshold as
    density_to_bitfield: min(mean_density, NERF_MIN_OPTICAL_THICKNESS);
    `dilate` max-pools 3^3 fine voxels for conservativeness against
    sub-voxel density features.

    `density_apply(params, pos)` is the activated density fn with params
    passed EXPLICITLY — closure-captured tables would be embedded in the
    HLO as constants (100x slower gathers + oversized remote-compile
    payloads through the tunnel; see ops/hashgrid.py).

    Returns a (C, G*factor, G*factor, G*factor) bool array (host numpy —
    callers move it to device once; ~400MB at 512^3 x 3 cascades).
    """
    import numpy as np

    coarse = np.asarray(coarse_bitfield)
    C, G = coarse.shape[0], coarse.shape[1]
    Gf = G * factor
    # the grid stores OPTICAL THICKNESS (density * MIN_CONE_STEPSIZE, see
    # update_density_grid); compare in the same units
    thresh = float(min(float(mean_density), NERF_MIN_OPTICAL_THICKNESS))
    thresh_raw = thresh / MIN_CONE_STEPSIZE
    f3 = factor**3
    offs = np.stack(
        np.meshgrid(*([np.arange(factor)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)  # (f^3, 3)

    fine = np.zeros((C, Gf, Gf, Gf), bool)
    eval_jit = jax.jit(density_apply)
    for c in range(C):
        idx = np.argwhere(coarse[c])  # (M, 3) coarse cells
        if len(idx) == 0:
            continue
        fine_idx = (idx[:, None, :] * factor + offs[None, :, :]).reshape(-1, 3)
        scale = 2.0**c
        centers = ((fine_idx.astype(np.float32) + 0.5) / Gf - 0.5) * scale + 0.5
        occ = np.empty(len(centers), bool)
        for s in range(0, len(centers), chunk):
            d = eval_jit(params, jnp.asarray(centers[s : s + chunk]))
            occ[s : s + chunk] = np.asarray(d) > thresh_raw
        fine[c, fine_idx[:, 0], fine_idx[:, 1], fine_idx[:, 2]] = occ

    if dilate:
        # separable 3^3 max-pool per cascade (np.roll wraparound only ever
        # ADDS voxels, and the &-mask below restricts to baked space),
        # restricted back to occupied coarse cells
        for c in range(C):
            f = fine[c]
            for ax in range(3):
                f = f | np.roll(f, 1, axis=ax) | np.roll(f, -1, axis=ax)
            up = np.repeat(
                np.repeat(np.repeat(coarse[c], factor, 0), factor, 1), factor, 2
            )
            fine[c] = f & up
    return fine

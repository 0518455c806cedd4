"""Ray marching through the occupancy grid + emission-absorption compositing.

Behavioral spec: reference nerf_device.cuh:359-534 (cone stepping `calc_dt`,
DDA voxel skipping `advance_to_next_voxel`,
`if_unoccupied_advance_to_next_occupied_voxel`) and testbed_nerf.cu:430-735
(`generate_next_nerf_network_inputs`, `composite_kernel_nerf`).

TPU design (SURVEY.md §7): no atomic compaction — rays are a fixed-shape
batch with per-lane alive masks.  A march step is pure VPU work (gathers
into the bitfield); samples are emitted into fixed (N, K) slabs via one-hot
slot writes; the MLP then runs dense on N*K inputs.  Skips are quantized to
cone-step multiples exactly like the reference's
`advance_to_next_voxel` do/while, so sample placement matches.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sienerf_tpu.common import (
    MAX_CONE_STEPSIZE,
    MIN_CONE_STEPSIZE,
    NERF_GRIDSIZE,
)
from sienerf_tpu.ops.occupancy import (
    mip_from_dt,
    mip_from_pos,
    occupancy_lookup,
    occupancy_lookup_packed,
    pack_occupancy,
    pos_to_cell,
)


def calc_dt(t: jnp.ndarray, cone_angle: float) -> jnp.ndarray:
    return jnp.clip(t * cone_angle, MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE)


def _as_packed(bitfield: jnp.ndarray) -> jnp.ndarray:
    """Accept either a (C,G,G,G) bool bitfield or its pack_occupancy rows
    ((N/128, 4) uint32).  The march loops probe the packed form; packing is
    an O(grid) elementwise pass, so frame renderers hoist it out of their
    per-round bodies by passing the packed rows straight through."""
    if bitfield.dtype == jnp.uint32:
        return bitfield
    return pack_occupancy(bitfield)


def cone_angle_for_aabb(aabb_scale: float, cone_angle_constant: float = 1.0 / 256.0) -> float:
    """Reference: uniform steps inside the unit cube, cone stepping for larger
    scenes (testbed_nerf.cu render path, m_nerf.cone_angle_constant)."""
    return 0.0 if aabb_scale <= 1.0 else cone_angle_constant


def _next_voxel_skip(t, pos, d, mip, dt, grid_size: int = NERF_GRIDSIZE):
    """Distance to hop past the current (empty) voxel at cascade `mip`,
    quantized up to whole dt steps (reference advance_to_next_voxel)."""
    scale = jnp.exp2(mip.astype(jnp.float32))
    p = ((pos - 0.5) / scale[..., None] + 0.5) * grid_size  # grid coords
    dg = d * (grid_size / scale[..., None])  # d(grid coords)/dt
    safe = jnp.where(jnp.abs(dg) < 1e-12, 1e-12, dg)
    nb = jnp.floor(p) + (dg > 0).astype(jnp.float32)
    delta = (nb - p) / safe
    delta = jnp.where(jnp.abs(dg) < 1e-12, jnp.inf, delta)
    tau = jnp.min(delta, axis=-1)  # world-t units to the nearest boundary
    tau = jnp.maximum(tau, 0.0) + 1e-5 * scale
    n_steps = jnp.clip(jnp.ceil(tau / dt), 1.0, 1e6)
    return n_steps * dt


@dataclass(frozen=True)
class MarchConfig:
    n_cascades: int = 1
    cone_angle: float = 0.0
    grid_size: int = NERF_GRIDSIZE


def march_rays(
    config: MarchConfig,
    bitfield: jnp.ndarray,  # (C,G,G,G) bool
    origins: jnp.ndarray,  # (N,3)
    dirs: jnp.ndarray,  # (N,3) unit
    t_start: jnp.ndarray,  # (N,)
    t_far: jnp.ndarray,  # (N,)
    n_samples: int,
    n_iters: int,
    span: int = 1,
    fine: jnp.ndarray | None = None,  # (C,G*f,G*f,G*f) bool render-baked grid
):
    """Collect up to `n_samples` occupied-space samples per ray within a
    bounded march.  Returns ts (N,K), dts (N,K), counts (N,), t_end (N,).

    span > 1 selects vectorized span marching: each iteration tests `span`
    consecutive cone-step candidates with ONE batched occupancy gather,
    emits the leading occupied run, then performs at most one voxel skip
    from the first unoccupied candidate — byte-identical sample placement
    to the one-candidate-per-iteration loop (emit XOR skip,
    generate_next_nerf_network_inputs testbed_nerf.cu:430), with span-x
    less serialized depth.  MEASURED on v5e: the batched (N,S) lookups cost
    more than the saved latency for the 720p fox frame (5.0s -> 7.5s), so
    the scalar loop stays the default; kept for future tuning.
    `n_iters` counts vectorized iterations when span > 1."""
    N = origins.shape[0]
    K = n_samples
    S = span
    if S <= 1:
        return _march_rays_scalar(
            config, bitfield, origins, dirs, t_start, t_far, n_samples, n_iters,
            fine=fine,
        )
    assert fine is None, "span marching does not support the fine render grid"

    iota_K = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)

    words_span = _as_packed(bitfield)

    def body(_, state):
        t, k, ts, dts = state
        # unrolled cone-step candidate chain t_0..t_{S-1} (+ end point)
        t_list, dt_list = [], []
        tj = t
        for _j in range(S):
            dtj = calc_dt(tj, config.cone_angle)
            t_list.append(tj)
            dt_list.append(dtj)
            tj = tj + dtj
        t_stack = jnp.stack(t_list + [tj], axis=1)  # (N,S+1)
        dt_stack = jnp.stack(dt_list, axis=1)  # (N,S)
        pos = origins[:, None, :] + t_stack[:, :S, None] * dirs[:, None, :]  # (N,S,3)
        mip = jnp.maximum(
            mip_from_pos(pos, config.n_cascades),
            mip_from_dt(dt_stack, config.n_cascades, config.grid_size),
        )
        occ = occupancy_lookup_packed(words_span, config.grid_size, pos, mip)  # (N,S)
        in_range = t_stack[:, :S] < t_far[:, None]
        run = jnp.cumprod((occ & in_range).astype(jnp.int32), axis=1)  # leading run
        n_lead = jnp.sum(run, axis=1)  # (N,)
        ray_active = (t < t_far) & (k < K)
        m = jnp.minimum(n_lead, K - k)  # samples emitted this iteration
        m = jnp.where(ray_active, m, 0)
        # emit candidates j < m into slots k..k+m-1
        for j in range(S):
            emit_j = ray_active & (j < m)
            write = (iota_K == (k + j)[:, None]) & emit_j[:, None]
            ts = jnp.where(write, t_stack[:, j][:, None], ts)
            dts = jnp.where(write, dt_stack[:, j][:, None], dts)
        # next t: candidate m (or the end point when the full span emitted);
        # add a voxel skip only when the run ended at an unoccupied
        # in-range candidate (not when blocked by K or t_far)
        # one-hot select (take_along_axis on the minor axis serializes, see
        # composite_chunk note)
        oh_m = jnp.arange(t_stack.shape[1], dtype=jnp.int32)[None, :] == m[:, None]
        t_next = jnp.sum(jnp.where(oh_m, t_stack, 0.0), axis=1)
        do_skip = ray_active & (m == n_lead) & (n_lead < S)
        pos_m = origins + t_next[:, None] * dirs
        dt_m = calc_dt(t_next, config.cone_angle)
        mip_m = jnp.maximum(
            mip_from_pos(pos_m, config.n_cascades),
            mip_from_dt(dt_m, config.n_cascades, config.grid_size),
        )
        skip = _next_voxel_skip(t_next, pos_m, dirs, mip_m, dt_m, config.grid_size)
        do_skip = do_skip & (t_next < t_far)
        t_new = jnp.where(ray_active, jnp.where(do_skip, t_next + skip, t_next), t)
        return t_new, k + m, ts, dts

    t0 = t_start
    k0 = jnp.zeros((N,), jnp.int32)
    ts0 = jnp.zeros((N, K), jnp.float32)
    dts0 = jnp.zeros((N, K), jnp.float32)
    t, k, ts, dts = jax.lax.fori_loop(0, n_iters, body, (t0, k0, ts0, dts0))
    return ts, dts, k, t


def _march_rays_scalar(
    config: MarchConfig,
    bitfield: jnp.ndarray,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    t_start: jnp.ndarray,
    t_far: jnp.ndarray,
    n_samples: int,
    n_iters: int,
    fine: jnp.ndarray | None = None,
):
    """One-candidate-per-iteration reference march (span=1 fallback and
    equivalence oracle for the vectorized version).

    With `fine` (a render-baked bitfield at `factor`x the training grid,
    bake_fine_bitfield), the march becomes a two-level DDA: samples are
    emitted only where the FINE grid is occupied; empty space is skipped at
    the coarsest level that is empty (whole coarse cell when the training
    grid says empty, one fine cell otherwise).  Strictly fewer samples than
    the coarse-only march at identical sample placement (the fine grid is a
    thresholded bake of the same density the samples would integrate)."""
    N = origins.shape[0]
    K = n_samples
    g_fine = fine.shape[1] if fine is not None else config.grid_size
    # pack once, probe rows in the loop (one elementwise pass; the loop does
    # iters x N scalar probes otherwise)
    words = _as_packed(bitfield)
    words_fine = _as_packed(fine) if fine is not None else None

    def body(_, state):
        t, k, ts, dts = state
        pos = origins + t[:, None] * dirs
        dt = calc_dt(t, config.cone_angle)
        mip = jnp.maximum(
            mip_from_pos(pos, config.n_cascades), mip_from_dt(dt, config.n_cascades, config.grid_size)
        )
        occ = occupancy_lookup_packed(words, config.grid_size, pos, mip)
        if fine is not None:
            occ_emit = occ & occupancy_lookup_packed(words_fine, g_fine, pos, mip)
        else:
            occ_emit = occ
        active = (t < t_far) & (k < K)
        emit = active & occ_emit
        slot = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1) == k[:, None]
        write = slot & emit[:, None]
        ts = jnp.where(write, t[:, None], ts)
        dts = jnp.where(write, dt[:, None], dts)
        skip = _next_voxel_skip(t, pos, dirs, mip, dt, config.grid_size)
        if fine is not None:
            skip_f = _next_voxel_skip(t, pos, dirs, mip, dt, g_fine)
            skip = jnp.where(occ, skip_f, skip)
        t = jnp.where(emit, t + dt, jnp.where(active, t + skip, t))
        k = k + emit.astype(jnp.int32)
        return t, k, ts, dts

    t0 = t_start
    k0 = jnp.zeros((N,), jnp.int32)
    ts0 = jnp.zeros((N, K), jnp.float32)
    dts0 = jnp.zeros((N, K), jnp.float32)
    t, k, ts, dts = jax.lax.fori_loop(0, n_iters, body, (t0, k0, ts0, dts0))
    return ts, dts, k, t


def advance_to_occupied(
    config: MarchConfig,
    bitfield: jnp.ndarray,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    t_start: jnp.ndarray,
    t_far: jnp.ndarray,
    n_iters: int,
) -> jnp.ndarray:
    """Advance each ray's t through empty space to its first occupied voxel
    (or t_far), without emitting samples — the reference's ray-init advance
    (advance_pos_nerf_kernel / if_unoccupied_advance_to_next_occupied_voxel,
    testbed_nerf.cu:364, nerf_device.cuh:461-494).  Run once per frame over
    ALL pixels so the streaming renderer's eval rounds start on content
    (measured: the first ~2 rounds per ray otherwise evaluate at fill~0)."""

    words = _as_packed(bitfield)

    def body(_, t):
        pos = origins + t[:, None] * dirs
        dt = calc_dt(t, config.cone_angle)
        mip = jnp.maximum(
            mip_from_pos(pos, config.n_cascades),
            mip_from_dt(dt, config.n_cascades, config.grid_size),
        )
        occ = occupancy_lookup_packed(words, config.grid_size, pos, mip)
        active = (t < t_far) & ~occ
        skip = _next_voxel_skip(t, pos, dirs, mip, dt, config.grid_size)
        return jnp.where(active, t + skip, t)

    return jax.lax.fori_loop(0, n_iters, body, t_start)


def retreat_to_occupied(
    config: MarchConfig,
    bitfield: jnp.ndarray,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    t_start: jnp.ndarray,
    t_far: jnp.ndarray,
    n_iters: int,
) -> jnp.ndarray:
    """Mirror of advance_to_occupied from the FAR end: retreat each ray's
    exit time t_far back through trailing empty space to just past its LAST
    occupied voxel (or down to t_start).  A ray whose whole span is empty
    collapses to t_start — frames then skip sky/background rays entirely
    instead of marching (or, in the baked renderer, gathering) the full
    span.  Pure reuse of the forward advance: walk the reversed ray
    o' = o + t_far*d, d' = -d from s=0 toward s=t_far-t_start."""
    o_rev = origins + t_far[:, None] * dirs
    span = jnp.maximum(t_far - t_start, 0.0)
    s = advance_to_occupied(config, bitfield, o_rev, -dirs, jnp.zeros_like(span), span, n_iters)
    return t_far - jnp.minimum(s, span)


def compact_samples(ts, dts, counts, M: int):
    """Compact a (N,K) marched-sample slab into a dense ray-major (M,)
    sample stream — the TPU equivalent of the reference's compacted training
    batch (generate_training_samples_nerf writes ray samples contiguously
    into a fixed max_samples buffer, testbed_nerf.cu:737-892).

    Rays that would overflow the M-sample budget are DROPPED entirely, like
    the reference's overflow rays (they get zero samples and no gradient) —
    truncating a ray mid-scene instead trains a fog "billboard" at the
    truncation surface.

    Gather-based (no scatter): each output slot finds its (ray, sample) via
    one searchsorted over the per-ray prefix sums.

    Returns (t (M,), dt (M,), ray_id (M,) int32 [== N for empty slots],
    ray_start (N,) int32, fits (N,) bool).
    """
    N, K = ts.shape
    prefix_incl = jnp.cumsum(counts)
    fits = prefix_incl <= M
    counts2 = jnp.where(fits, counts, 0)
    prefix_incl2 = jnp.cumsum(counts2)
    ray_start = (prefix_incl2 - counts2).astype(jnp.int32)
    total = prefix_incl2[-1]
    m = jnp.arange(M, dtype=jnp.int32)
    ray_id = jnp.searchsorted(prefix_incl2, m, side="right").astype(jnp.int32)
    rid_c = jnp.minimum(ray_id, N - 1)
    j = m - jnp.take(ray_start, rid_c)
    flat = rid_c * K + jnp.clip(j, 0, K - 1)
    t = jnp.take(ts.reshape(-1), flat)
    dt = jnp.take(dts.reshape(-1), flat)
    ray_id = jnp.where(m < total, ray_id, N)
    return t, dt, ray_id, ray_start, fits


def composite_flat(
    rgb,  # (M,3) activated colors
    density,  # (M,) activated densities
    ts,  # (M,)
    dts,  # (M,)
    ray_id,  # (M,) int32 ray segment ids, sorted; == n_rays for empty slots
    ray_start,  # (n_rays,) int32 first-slot index per ray
    n_rays: int,
    min_transmittance: float = 1e-4,
):
    """Front-to-back emission-absorption over a ray-major compacted sample
    stream (same math as composite_chunk, restructured for flat segments:
    per-ray exclusive transmittance via a global log-space cumsum minus the
    value at each ray's first slot).

    Returns (rgb_sum (n,3), opacity (n,), T_out (n,), depth (n,) =
    weighted expected termination distance).
    """
    M = ts.shape[0]
    valid = ray_id < n_rays
    rid = jnp.minimum(ray_id, n_rays - 1)
    alpha = jnp.where(valid, 1.0 - jnp.exp(-density * dts), 0.0)
    lg = jnp.log1p(-jnp.minimum(alpha, 1.0 - 1e-7))
    c = jnp.cumsum(lg)
    c_excl = c - lg
    base = jnp.take(c_excl, jnp.clip(jnp.take(ray_start, rid), 0, M - 1))
    T_excl = jnp.exp(c_excl - base)
    live = T_excl >= min_transmittance
    w = jnp.where(valid & live, alpha * T_excl, 0.0)

    def seg(v):
        return jax.ops.segment_sum(
            v, ray_id, num_segments=n_rays + 1, indices_are_sorted=True
        )[:n_rays]

    rgb_sum = seg(w[:, None] * rgb)
    opacity = seg(w)
    T_out = jnp.exp(seg(jnp.where(valid & live, lg, 0.0)))
    T_out = jnp.where(T_out < min_transmittance, 0.0, T_out)
    depth = seg(w * ts)
    return rgb_sum, opacity, T_out, depth


def composite_chunk(
    rgb: jnp.ndarray,  # (N,K,3) activated colors
    density: jnp.ndarray,  # (N,K) activated densities
    ts: jnp.ndarray,  # (N,K)
    dts: jnp.ndarray,  # (N,K)
    valid: jnp.ndarray,  # (N,K) bool
    T_in: jnp.ndarray,  # (N,) incoming transmittance
    min_transmittance: float = 1e-4,
):
    """Front-to-back emission-absorption over one chunk of samples.

    Matches composite_kernel_nerf (testbed_nerf.cu:528-735): weight =
    alpha * T, early-out once T drops below min_transmittance (later samples
    in the chunk contribute nothing), depth = t of the max-weight sample.
    Returns (rgb_sum (N,3), opacity_sum (N,), T_out (N,), best_w (N,),
    best_t (N,)).
    """
    alpha = jnp.where(valid, 1.0 - jnp.exp(-density * dts), 0.0)
    one_minus = 1.0 - alpha
    # exclusive cumulative transmittance within the chunk
    cum = jnp.cumprod(one_minus, axis=1)
    T_excl = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1) * T_in[:, None]
    live = T_excl >= min_transmittance
    w = jnp.where(live, alpha * T_excl, 0.0)
    rgb_sum = jnp.sum(w[..., None] * rgb, axis=1)
    opacity = jnp.sum(w, axis=1)
    T_out = T_in * jnp.prod(jnp.where(live, one_minus, 1.0), axis=1)
    T_out = jnp.where(T_out < min_transmittance, 0.0, T_out)
    # max-weight sample via a one-hot reduction: take_along_axis with a
    # per-row minor-axis index lowers to a serialized per-row gather on TPU
    # (~100x; same class as NOTES_ROUND1 fact 3), a broadcast compare+sum
    # stays fully vectorized
    best = jnp.argmax(w, axis=1)
    onehot = jnp.arange(w.shape[1], dtype=jnp.int32)[None, :] == best[:, None]
    best_w = jnp.max(w, axis=1)
    best_t = jnp.sum(jnp.where(onehot, ts, 0.0), axis=1)
    return rgb_sum, opacity, T_out, best_w, best_t

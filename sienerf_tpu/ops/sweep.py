"""Shear-warp slab-sweep volume renderer primitives: render the baked
field with ZERO random gathers.

Why this exists (NOTES_ROUND4 roofline): the gather-based baked renderer
is bound by the TPU's random-row gather rate (~88M descriptors/s measured
— tools/bench_baked_gather.py), which is ~0.3% of HBM bandwidth at 32-byte
rows.  Every knob sweep since round 2 moved within that wall.  This module
removes the wall instead: the classic shear-warp factorization (Lacroute &
Levoy, SIGGRAPH '94 — perspective variant) decomposes the view transform
into

  per-slab AFFINE resample  (separable bilinear == two banded matmuls, MXU)
  x  one final 2D projective warp (one small-table gather pass per frame).

The volume is streamed slab by slab in MEMORY ORDER (HBM sequential reads
at bandwidth, not descriptors), every slab is resampled onto a fixed
"intermediate image" with two matmuls, and compositing is elementwise VPU
work.  The TPU-native insight making the per-slab map affine: for a pinhole
at origin o, the ray through intermediate pixel with gnomonic coordinate
e = d_{bc}/d_a crosses the plane x_a = x at

    (u, v) = o_{bc} + (x - o_a) * e                                   (*)

i.e. a per-slab UNIFORM SCALE of the fixed e-grid — so slab -> intermediate
is separable bilinear, exactly two (H_i, Rv) @ (Rv, Rv) @ (Rv, W_i)
matmuls.  The reference's renderer has no counterpart (it is a CUDA
megakernel marcher, testbed_nerf.cu:2022-2145); this is the same volume
integral evaluated slab-wise:

  - sample planes: every vertex lattice plane x = lo_m + j*pitch_m of every
    cascade, swept front-to-back in world order (cascades interleave);
  - per sample: premultiplied bilinear in-plane interpolation of the baked
    (sigma*rgb, sigma) grid (premultiplication makes culled zero-density
    vertices weightless, like the trilinear path's sentinel renorm);
  - dt = pitch_m * sec(ray, axis): the distance to the next same-cascade
    plane along the ray (uniform ss=1 stepping — DENSER than the gather
    renderer's cone chains, never sparser);
  - cascade ownership: cascade m's contribution is zeroed strictly inside
    cascade m-1's cube (mip_from_pos convention, nerf_device.cuh).

Coordinate canon: callers orient the grid so the sweep axis is axis 0
ascending with all rays' d_a > 0 (choose a = argmax |forward|; flip with
x -> 1-x keeps cascade cubes, centered at 0.5, invariant).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def slab_schedule(n_cascades: int, resolution: int):
    """Static front-to-back slab schedule over all cascades.

    Returns numpy arrays (S,) — casc, slab index j, world x, pitch, and
    inner-mask flag (cascade m slab lies at |x-0.5| < side(m-1)/2, so its
    central (R/4, 3R/4) vertex square must be zeroed — that region belongs
    to cascade m-1).  Sample planes are j = 0..R-1 (each integrates the
    [x_j, x_j + pitch) segment; the j = R face plane starts no segment).
    """
    K, R = n_cascades, resolution
    casc, slab, xs, pitch, inner = [], [], [], [], []
    for m in range(K):
        side = 2.0 ** m
        lo = 0.5 - 0.5 * side
        p = side / R
        for j in range(R):
            x = lo + j * p
            casc.append(m)
            slab.append(j)
            xs.append(x)
            pitch.append(p)
            inner.append(m > 0 and abs(x - 0.5) < 2.0 ** (m - 2))
    order = np.argsort(np.asarray(xs), kind="stable")
    return (
        np.asarray(casc, np.int32)[order],
        np.asarray(slab, np.int32)[order],
        np.asarray(xs, np.float32)[order],
        np.asarray(pitch, np.float32)[order],
        np.asarray(inner, np.bool_)[order],
    )


def orient_grid(grid5: jnp.ndarray, axis: int, flip: bool) -> jnp.ndarray:
    """(K, X, Y, Z, C) volume -> (K, S_a, C, S_b, S_c) slab-major layout
    for the sweep along `axis` (0/1/2), ascending after optional flip.
    b < c are the two non-swept axes in ascending index order."""
    b, c = [ax for ax in (0, 1, 2) if ax != axis]
    g = jnp.transpose(grid5, (0, 1 + axis, 4, 1 + b, 1 + c))
    if flip:
        g = jnp.flip(g, axis=1)
    return g


def canon_coords(vec3: jnp.ndarray, axis: int, flip: bool, is_point: bool):
    """World vector/point -> canonical sweep coords (a, b, c).  Points flip
    about the cascade center (x -> 1-x); directions negate."""
    b, c = [ax for ax in (0, 1, 2) if ax != axis]
    out = jnp.stack([vec3[..., axis], vec3[..., b], vec3[..., c]], axis=-1)
    if flip:
        flip_a = (1.0 - out[..., 0]) if is_point else (-out[..., 0])
        out = jnp.concatenate([flip_a[..., None], out[..., 1:]], axis=-1)
    return out


def _interp_matrix(targets: jnp.ndarray, n_src: int,
                   interp: str = "bilinear") -> jnp.ndarray:
    """(M,) continuous source coordinates -> (M, n_src) resampling
    weights; rows whose coordinate falls outside [0, n_src-1] are all-zero
    (samples beyond the cascade cube contribute nothing, matching the
    marcher's oob handling).

    interp='bilinear': hat weights.  interp='nearest': one-hot selection
    (round half DOWN: at an exact half-integer target the lower source
    index wins, `(d > -0.5) & (d <= 0.5)`) — EXACT in bf16 (weights are
    0/1), and the in-plane
    sampling then matches the gather renderer's nearest-vertex reads:
    round-3 evidence says fox fur wants resolution, not interpolation
    (trilinear R160 measured 4 dB WORSE than nearest — NOTES_ROUND3), and
    the bilinear sweep reproduced exactly that deficit on the near-train
    split views (NOTES_ROUND4)."""
    src = jax.lax.broadcasted_iota(jnp.float32, (targets.shape[0], n_src), 1)
    d = targets[:, None] - src
    if interp == "nearest":
        w = ((d > -0.5) & (d <= 0.5)).astype(jnp.float32)
    else:
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    inb = (targets >= 0.0) & (targets <= n_src - 1)
    return jnp.where(inb[:, None], w, 0.0)


def _composite_over(
    sched, oriented, slab_live, o_c, eb, ec, near, min_transmittance,
    resolution: int, unroll: int = 1, return_bw: bool = False,
    vary_axes=None, interp: str = "nearest", group: int = 1, t_stop=None,
    phase=None,
):
    """Front-to-back composite of the given slab schedule (a tuple of
    (S,) arrays: casc, slab, x, pitch, inner, valid) onto the intermediate
    image.  Returns (rgb (Hi,Wi,3), opacity, T, depth_t (Hi,Wi)).

    `group` > 1 processes G consecutive slabs per scan step: the two
    resample contractions become G-batched matmuls (better MXU occupancy)
    and the G composite updates chain within one fused step, cutting
    carry HBM traffic and scan-iteration scheduling G-fold.  Bit-identical
    to group=1 (the in-group fold is the same sequential math)."""
    R = resolution
    Rv = R + 1
    G = max(1, int(group))
    Hi, Wi = eb.shape[0], ec.shape[0]
    # sec(ray, axis) per intermediate pixel: |d|/d_a for d = (1, eb, ec)
    L = jnp.sqrt(1.0 + eb[:, None] ** 2 + ec[None, :] ** 2)  # (Hi, Wi)

    # central (R/4, 3R/4) vertex square owned by the finer cascade
    ii = jax.lax.broadcasted_iota(jnp.int32, (Rv, Rv), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (Rv, Rv), 1)
    inner_sq = (
        (ii > R // 4) & (ii < 3 * R // 4) & (jj > R // 4) & (jj < 3 * R // 4)
    )

    if G > 1:
        S = sched[0].shape[0]
        Sp = -(-S // G) * G
        if Sp > S:
            pads = []
            for a in sched:
                padv = jnp.zeros((Sp - S,), a.dtype) if a.dtype != jnp.float32 \
                    else jnp.ones((Sp - S,), a.dtype)
                pads.append(jnp.concatenate([a, padv]))
            sched = tuple(pads)
        sched = tuple(a.reshape(Sp // G, G) for a in sched)

    def resample(m, j, x, pitch, inner):
        """One slab -> (s (4,Hi,Wi) f32, t_hat, dt maps).

        With a non-None `phase` (spp along-axis jitter, VERDICT r4 #4) the
        sample plane moves to x + phase*pitch and the slab value blends
        linearly between lattice planes j and j+1 — the same quadrature
        the live renderer's jittered t-chains average to.  phase=None (or
        0) reproduces the deterministic plane-exact sweep bit-for-bit.
        (The cascade-ownership zeroing keeps plane j's flag for the
        blended sample — an off-by-phase*pitch boundary approximation on
        interior density that the finer cascade owns anyway.)"""
        slab = jax.lax.dynamic_slice(
            oriented, (m, j, 0, 0, 0), (1, 1, 4, Rv, Rv)
        )[0, 0]  # (4, Rv, Rv)
        if phase is not None:
            jn = jnp.minimum(j + 1, oriented.shape[1] - 1)
            slab2 = jax.lax.dynamic_slice(
                oriented, (m, jn, 0, 0, 0), (1, 1, 4, Rv, Rv)
            )[0, 0]
            ph = jnp.asarray(phase, jnp.bfloat16)
            slab = slab * (jnp.bfloat16(1) - ph) + slab2 * ph
            x = x + phase * pitch
        slab = jnp.where(inner & inner_sq[None], jnp.bfloat16(0), slab)
        x_rel = x - o_c[0]
        lo = 0.5 - 0.5 * pitch * R
        gu = (o_c[1] + x_rel * eb - lo) / pitch  # (Hi,)
        gv = (o_c[2] + x_rel * ec - lo) / pitch  # (Wi,)
        A = _interp_matrix(gu, Rv, interp).astype(jnp.bfloat16)
        Bm = _interp_matrix(gv, Rv, interp).astype(jnp.bfloat16)
        # separable bilinear as two MXU matmuls; bf16-ok: interpolation
        # weights in [0,1] and int16-quantized values — 2^-9 relative
        # rounding is far below the bake's own quantization floor
        t1 = jnp.dot(A, slab.transpose(1, 0, 2).reshape(Rv, 4 * Rv),
                     preferred_element_type=jnp.float32)
        t1 = t1.reshape(Hi, 4, Rv).astype(jnp.bfloat16)
        # bf16-ok: same interpolation contraction as above (0/1 or
        # hat weights x int16-quantized values; f32 accumulation)
        t2 = jnp.dot(t1.transpose(1, 0, 2).reshape(4 * Hi, Rv), Bm.T,
                     preferred_element_type=jnp.float32)
        return t2.reshape(4, Hi, Wi), x_rel * L, pitch * L

    def accumulate(carry, s, t_hat, dt):
        C, T, op, bw, bt = carry
        sigma = jnp.maximum(s[3], 0.0)
        rgb = s[:3] / jnp.maximum(sigma, 1e-10)[None]
        alive = (T >= min_transmittance) & (t_hat >= near)
        if t_stop is not None:
            # per-pixel depth stop (hybrid blend): samples at/behind the
            # mesh surface contribute nothing — the march is clamped at the
            # mesh depth exactly like the gather path's t_cap
            alive = alive & (t_hat <= t_stop)
        alpha = jnp.where(alive, 1.0 - jnp.exp(-sigma * dt), 0.0)
        w = T * alpha
        better = w > bw
        return (
            C + w[None] * rgb,
            T * (1.0 - alpha),
            op + w,
            jnp.where(better, w, bw),
            jnp.where(better, t_hat, bt),
        )

    def body(carry, entry):
        m, j, x, pitch, inner, valid = entry
        # with slab-phase jitter the blended plane draws from j AND j+1,
        # so the skip test must OR both planes' liveness
        def plane_live(mm, jj_):
            lv = slab_live[mm, jj_]
            if phase is not None:
                lv = lv | slab_live[
                    mm, jnp.minimum(jj_ + 1, slab_live.shape[1] - 1)]
            return lv

        if G == 1:
            live = valid & plane_live(m, j) & (
                jnp.max(carry[1]) >= min_transmittance)

            def do(_):
                s, t_hat, dt = resample(m, j, x, pitch, inner)
                return accumulate(carry, s, t_hat, dt)

            return jax.lax.cond(live, do, lambda _: carry, None), None

        live = jnp.any(valid & plane_live(m, j)) & (
            jnp.max(carry[1]) >= min_transmittance)

        def do(_):
            new = carry
            for g in range(G):
                s, t_hat, dt = resample(m[g], j[g], x[g], pitch[g], inner[g])
                s = jnp.where(valid[g] & plane_live(m[g], j[g]), s, 0.0)
                new = accumulate(new, s, t_hat, dt)
            return new

        return jax.lax.cond(live, do, lambda _: carry, None), None

    zero = jnp.zeros((Hi, Wi), jnp.float32)
    carry = (jnp.zeros((3, Hi, Wi), jnp.float32), 1.0 - zero, zero, zero, zero)
    if vary_axes:
        # under shard_map the sharded-schedule branch outputs are
        # axis-varying; the carry must start varying too or lax.cond's
        # branch types mismatch (jax >= 0.8 varying-axis typing)
        carry = jax.tree.map(
            lambda a: jax.lax.pcast(a, vary_axes, to="varying"), carry
        )
    (C, T, op, bw, bt), _ = jax.lax.scan(body, carry, sched, unroll=unroll)
    if return_bw:
        return C.transpose(1, 2, 0), op, T, bt, bw
    return C.transpose(1, 2, 0), op, T, bt


def _schedule_arrays(K: int, R: int, pad_to: int | None = None):
    casc, slab, xs, pitch, inner = slab_schedule(K, R)
    S = len(xs)
    valid = np.ones(S, np.bool_)
    if pad_to is not None and pad_to > S:
        pad = pad_to - S
        casc = np.pad(casc, (0, pad))
        slab = np.pad(slab, (0, pad))
        xs = np.pad(xs, (0, pad))
        pitch = np.pad(pitch, (0, pad), constant_values=1.0)
        inner = np.pad(inner, (0, pad))
        valid = np.pad(valid, (0, pad))
    return tuple(jnp.asarray(a) for a in (casc, slab, xs, pitch, inner, valid))


@partial(
    jax.jit,
    static_argnames=("resolution", "n_cascades", "unroll", "interp", "group"),
)
def sweep_composite(
    oriented,            # (K, R+1, 4, R+1, R+1) bf16: [s*r, s*g, s*b, s]
    slab_live,           # (K, R+1) bool
    o_c,                 # (3,) canonical camera origin
    eb,                  # (Hi,) intermediate row gnomonic coords
    ec,                  # (Wi,) intermediate col gnomonic coords
    near,                # scalar
    min_transmittance,   # scalar
    t_stop=None,         # optional (Hi, Wi) per-pixel t cap (hybrid blend)
    phase=None,          # optional scalar slab-phase jitter in [0,1) (spp)
    *,
    resolution: int,
    n_cascades: int,
    unroll: int = 1,
    interp: str = "nearest",
    group: int = 1,
):
    """Single-device sweep: composite every cascade slab front to back."""
    sched = _schedule_arrays(n_cascades, resolution)
    return _composite_over(
        sched, oriented, slab_live, o_c, eb, ec, near, min_transmittance,
        resolution, unroll, interp=interp, group=group, t_stop=t_stop,
        phase=phase,
    )


def sweep_composite_sharded(
    mesh, oriented, slab_live, o_c, eb, ec, near, min_transmittance,
    *, resolution: int, n_cascades: int, interp: str = "nearest",
):
    """Slab-range-parallel sweep over the `rays` mesh axis.

    The over-operator is ASSOCIATIVE: each device composites a contiguous
    front-to-back slice of the slab schedule into a partial
    (C_i, T_i, op_i, bw_i, bt_i), and the partials fold in schedule order:

        C = sum_i (prod_{j<i} T_j) * C_i,   T = prod_i T_i,

    with the best-weight depth combined by rescaling each device's local
    best weight by its prefix transmittance (exactly the weight the
    single-device sweep would have assigned — the fold is bit-faithful up
    to f32 rounding when min_transmittance=0; the per-pixel minT cutoff is
    the one non-associative term, since a shard cannot see upstream T, so
    multichip frames match within ~minT of the single-chip ones).  The
    volume is replicated (cheap vs sharding: slab reads stay HBM-local);
    only the tiny schedule arrays shard.  SURVEY.md §2.9.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ndev = mesh.devices.size
    S = n_cascades * resolution
    pad_to = -(-S // ndev) * ndev
    sched = _schedule_arrays(n_cascades, resolution, pad_to)

    def shard_fn_full(sched_loc, oriented, slab_live, o_c, eb, ec):
        C, op, T, bt, bw = _composite_over(
            sched_loc, oriented, slab_live, o_c, eb, ec, near,
            min_transmittance, resolution, return_bw=True,
            vary_axes=("rays",), interp=interp,
        )
        return tuple(x[None] for x in (C, T, op, bw, bt))  # leading shard axis

    fn = shard_map(
        shard_fn_full, mesh=mesh,
        in_specs=(P("rays"), P(), P(), P(), P(), P()),
        out_specs=P("rays"),
    )
    C_p, T_p, op_p, bw_p, bt_p = fn(sched, oriented, slab_live, o_c, eb, ec)

    Hi, Wi = eb.shape[0], ec.shape[0]
    C = jnp.zeros((Hi, Wi, 3), jnp.float32)
    T = jnp.ones((Hi, Wi), jnp.float32)
    op = jnp.zeros((Hi, Wi), jnp.float32)
    bw = jnp.zeros((Hi, Wi), jnp.float32)
    bt = jnp.zeros((Hi, Wi), jnp.float32)
    for i in range(ndev):
        cand = T * bw_p[i]
        better = cand > bw
        bw = jnp.where(better, cand, bw)
        bt = jnp.where(better, bt_p[i], bt)
        C = C + T[..., None] * C_p[i]
        op = op + T * op_p[i]
        T = T * T_p[i]
    return C, op, T, bt


def warp_to_pixels(maps: jnp.ndarray, e_px: jnp.ndarray,
                   eb0, deb, ec0, dec) -> jnp.ndarray:
    """Final projective warp: sample the composited intermediate maps
    (Hi, Wi, C) at each output pixel's gnomonic coordinate (N, 2) with
    bilinear interpolation.  The only gather pass in the whole sweep
    renderer — four row descriptors per pixel from a small table, with all
    C channels riding each row (bytes are free at fixed descriptor count,
    tools/bench_baked_gather.py)."""
    Hi, Wi, C = maps.shape
    fi = jnp.clip((e_px[:, 0] - eb0) / deb, 0.0, Hi - 1.0)
    fj = jnp.clip((e_px[:, 1] - ec0) / dec, 0.0, Wi - 1.0)
    i0 = jnp.minimum(jnp.floor(fi).astype(jnp.int32), Hi - 2)
    j0 = jnp.minimum(jnp.floor(fj).astype(jnp.int32), Wi - 2)
    wu = (fi - i0.astype(jnp.float32))[:, None]
    wv = (fj - j0.astype(jnp.float32))[:, None]
    flat = maps.reshape(Hi * Wi, C)
    base = i0 * Wi + j0
    r00 = jnp.take(flat, base, axis=0)
    r01 = jnp.take(flat, base + 1, axis=0)
    r10 = jnp.take(flat, base + Wi, axis=0)
    r11 = jnp.take(flat, base + Wi + 1, axis=0)
    return (
        r00 * (1 - wu) * (1 - wv) + r01 * (1 - wu) * wv
        + r10 * wu * (1 - wv) + r11 * wu * wv
    )

"""Fused Pallas slab-sweep composite: the whole front-to-back sweep in ONE
kernel with the carry resident in VMEM.

Why (NOTES_ROUND4/5 roofline): the XLA `lax.scan` sweep (ops/sweep.py)
materializes per slab the resampled (4, Hi, Wi) f32 image and round-trips
the 7-plane f32 carry through HBM — ~100 MB of HBM traffic per slab,
~77 GB/frame, 19x the design's own light speed.  Group-batching (G=4)
recovers only ~21% (tools/ab_sweep_group.py: 516 -> 409 ms) because the
resample materialization remains.  This kernel removes ALL of it:

  grid = (HT, S): for each row-tile of the intermediate image, sweep every
  slab front to back.  The carry (rgb, T, best-w, best-t) lives in the
  output VMEM blocks across the S axis (revisited blocks stay resident —
  the standard TPU accumulation pattern); the slab stream is the only HBM
  traffic (double-buffered by BlockSpec index_map on a scalar-prefetched
  schedule).  Per slab the separable resample is two MXU matmuls per
  channel with NO transposes:

      t1_c  = A (BT, Rp) @ slab_c (Rp, Rp)          # rows: gu weights
      out_c = t1_c (BT, Rp) @ W2 (Rp, Wi)           # cols: gv weights

  (A/W2 are built in-kernel on the VPU from the slab's affine e-grid map
  gu = su*eb + bu, gv = su*ec + bv — ops/sweep.py docstring math.)

HBM traffic/frame: HT x volume stream (909 MB padded) + carry tiles once
= ~6.5 GB at BT=128 -> ~8 ms; MXU ~4.1 TFLOP -> ~21 ms at peak.  Design
speed-of-light ~30-40 ms/720p vs 516 ms for the XLA scan path.

The kernel reproduces ops/sweep._composite_over exactly (same slab
schedule, same cascade-ownership zeroing, same premultiplied in-plane
interpolation, same over-operator) — tests/test_sweep_pallas.py asserts
pixel equality against it in interpret mode, and the TPU A/B is
tools/ab_sweep_pallas.py.  Reference spec: the volume integral of
NerfTracer::trace (/root/reference/src/testbed_nerf.cu:2022-2145).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sienerf_tpu.ops.sweep import slab_schedule

# padded in-plane size: both source dims of a slab are padded 257 -> RP so
# every matmul operand is lane/sublane aligned (128/16 multiples for bf16)
RP = 384


def _sweep_kernel(
    # scalar prefetch (SMEM)
    idx_ref,      # (S, 4) int32: casc, slab, slab+1 (clamped), pad
    par_ref,      # (S, 8) f32: su, bu, bv, x_rel, pitch, inner, valid, pad
    misc_ref,     # (3,) f32: min_transmittance, near, slab phase
    # VMEM inputs: streamed slab block(s), then the per-tile planes
    *refs,
    # slab_ref   (1, 1, 4, RP, RP) bf16 — lattice plane j
    # [slab2_ref (1, 1, 4, RP, RP) bf16 — plane j+1, only if use_phase]
    # eb_ref     (BT, 1) f32 row gnomonic coords for this tile
    # ec_ref     (1, Wi) f32 col gnomonic coords
    # mask_ref   (RP, RP) bf16 inner-square ownership mask (0 inside)
    # stop_ref   (BT, Wi) f32 per-pixel t stop (hybrid) or +inf
    # then VMEM outputs (carry, resident across the S axis):
    # c_ref (3, BT, Wi) f32, t_ref, bw_ref, bt_ref (BT, Wi) f32
    n_src: int,   # valid source rows/cols (R+1)
    interp: str,
    use_stop: bool,
    use_phase: bool,
):
    if use_phase:
        (slab_ref, slab2_ref, eb_ref, ec_ref, mask_ref, stop_ref,
         c_ref, t_ref, bw_ref, bt_ref) = refs
    else:
        (slab_ref, eb_ref, ec_ref, mask_ref, stop_ref,
         c_ref, t_ref, bw_ref, bt_ref) = refs
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        c_ref[...] = jnp.zeros_like(c_ref)
        t_ref[...] = jnp.ones_like(t_ref)
        bw_ref[...] = jnp.zeros_like(bw_ref)
        bt_ref[...] = jnp.zeros_like(bt_ref)

    su = par_ref[s, 0]
    bu = par_ref[s, 1]
    bv = par_ref[s, 2]
    x_rel = par_ref[s, 3]
    pitch = par_ref[s, 4]
    inner = par_ref[s, 5]
    valid = par_ref[s, 6]
    minT = misc_ref[0]
    near = misc_ref[1]
    if use_phase:
        # slab-phase jitter: sample plane x + phase*pitch, value blended
        # between lattice planes j and j+1 (spp quadrature — VERDICT r4 #4)
        ph = misc_ref[2]
        su = su + ph
        x_rel = x_rel + ph * pitch

    eb = eb_ref[...]          # (BT, 1)
    ec = ec_ref[...]          # (1, Wi)
    BT = eb.shape[0]
    Wi = ec.shape[1]

    def weights(tgt, rows, cols, iota_dim):
        """Interp weight matrix (rows, cols) for continuous targets `tgt`
        broadcast along iota_dim (the source-index axis)."""
        # int32 iota: Mosaic's tpu.iota is integer-only
        src = jax.lax.broadcasted_iota(
            jnp.int32, (rows, cols), iota_dim).astype(jnp.float32)
        d = tgt - src
        if interp == "nearest":
            w = ((d > -0.5) & (d <= 0.5)).astype(jnp.float32)
        else:
            w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
        inb = (tgt >= 0.0) & (tgt <= n_src - 1.0)
        return jnp.where(inb, w, 0.0)

    gu = su * eb + bu                       # (BT, 1)
    gv = su * ec + bv                       # (1, Wi)
    A = weights(gu, BT, RP, 1).astype(jnp.bfloat16)        # (BT, RP)
    W2 = weights(gv, RP, Wi, 0).astype(jnp.bfloat16)       # (RP, Wi)

    slab = slab_ref[0, 0]                   # (4, RP, RP) bf16
    if use_phase:
        # complement in f32: a SCALAR bf16 subtract (bf16(1) - ph16) hits
        # Mosaic's unimplemented arith.subf legalization on this stack
        ph = misc_ref[2]
        ph16 = ph.astype(jnp.bfloat16)
        om16 = (1.0 - ph).astype(jnp.bfloat16)
        slab = slab * om16 + slab2_ref[0, 0] * ph16
    msk = jnp.where(inner > 0.5, mask_ref[...], jnp.bfloat16(1.0))

    def resample(c):
        sc = slab[c] * msk
        t1 = jnp.dot(A, sc, preferred_element_type=jnp.float32)
        return jnp.dot(t1.astype(jnp.bfloat16), W2,
                       preferred_element_type=jnp.float32)  # (BT, Wi) f32

    sigma = jnp.maximum(resample(3), 0.0)
    L = jnp.sqrt(1.0 + eb * eb + ec * ec)   # (BT, Wi)
    t_hat = x_rel * L
    dt = pitch * L
    T = t_ref[...]
    alive = (T >= minT) & (t_hat >= near)
    if use_stop:
        alive &= t_hat <= stop_ref[...]
    alpha = jnp.where(alive, 1.0 - jnp.exp(-sigma * dt), 0.0) * valid
    w = T * alpha
    inv_sigma = w / jnp.maximum(sigma, 1e-10)
    for c in range(3):
        c_ref[c, :, :] = c_ref[c, :, :] + inv_sigma * resample(c)
    better = w > bw_ref[...]
    bt_ref[...] = jnp.where(better, t_hat, bt_ref[...])
    bw_ref[...] = jnp.where(better, w, bw_ref[...])
    t_ref[...] = T * (1.0 - alpha)


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "n_cascades", "interp", "block_rows",
                     "interpret", "prepadded", "data_flip"),
)
def sweep_composite_pallas(
    oriented,            # (K, R+1, 4, R+1, R+1) bf16 [s*r, s*g, s*b, s]
    slab_live,           # (K, R+1) bool — accepted for API parity (unused:
                         # the fused kernel's slab cost is one DMA; fox
                         # executes every slab anyway, NOTES_ROUND4)
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
    interp: str = "nearest",
    block_rows: int = 128,
    interpret: bool = False,
    prepadded: bool = False,
    data_flip: bool = False,
):
    """Drop-in fused replacement for ops/sweep.sweep_composite (same
    returns: rgb (Hi,Wi,3), opacity, T, depth_t), plus an optional
    per-pixel `t_stop` for the hybrid depth-tested blend and an optional
    slab-phase jitter `phase` (spp quadrature: the sample plane moves to
    x + phase*pitch, values blend between lattice planes j and j+1 — a
    second streamed slab block; ~2x slab DMA, still bandwidth-cheap)."""
    del slab_live
    # Mosaic is TPU-only: fall back to the interpreter on other backends
    # (CPU tests / dryrun); trace-time check, keyed per-device by jit.
    interpret = interpret or jax.default_backend() != "tpu"
    K, R = n_cascades, resolution
    Rv = R + 1
    Hi, Wi = eb.shape[0], ec.shape[0]
    BT = block_rows
    assert Hi % BT == 0, (Hi, BT)
    HT = Hi // BT

    casc, slab, xs, pitch, inner = slab_schedule(K, R)
    S = len(xs)
    # data_flip: the canonical frame mirrors the sweep axis (x -> 1-x).
    # Instead of physically flipping the multi-GB volume, read DATA plane
    # R-j for canonical slab j (the plane lattices coincide under the
    # mirror: 1 - x_j = x_{R-j}); the phase neighbor j+1 becomes data
    # plane R-j-1.
    slab_d = (R - slab) if data_flip else slab
    jn = np.clip(slab_d + (-1 if data_flip else 1), 0, R)
    idx = jnp.asarray(
        np.stack([casc, slab_d, jn, np.zeros_like(slab)], axis=1),
        jnp.int32)
    xs_j = jnp.asarray(xs)
    pitch_j = jnp.asarray(pitch)
    x_rel = xs_j - o_c[0]
    lo = 0.5 - 0.5 * pitch_j * R
    su = x_rel / pitch_j
    bu = (o_c[1] - lo) / pitch_j
    bv = (o_c[2] - lo) / pitch_j
    par = jnp.stack(
        [su, bu, bv, x_rel, pitch_j,
         jnp.asarray(inner, jnp.float32),
         jnp.ones((S,), jnp.float32),
         jnp.zeros((S,), jnp.float32)], axis=1)
    misc = jnp.stack(
        [jnp.asarray(min_transmittance, jnp.float32),
         jnp.asarray(near, jnp.float32),
         jnp.asarray(0.0 if phase is None else phase, jnp.float32)])

    if prepadded:
        # already (K, S>=Rv, 4, RP, RP) — e.g. the fused shade kernel's
        # direct output (ops/shade_pallas.py)
        assert oriented.shape[-1] == RP and oriented.shape[-2] == RP
        padded = oriented
    else:
        # zero-pad both in-plane dims to RP for aligned matmul operands
        padded = jnp.pad(
            oriented, ((0, 0), (0, 0), (0, 0), (0, RP - Rv), (0, RP - Rv)))

    ii = jax.lax.broadcasted_iota(jnp.int32, (RP, RP), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (RP, RP), 1)
    inner_sq = ((ii > R // 4) & (ii < 3 * R // 4)
                & (jj > R // 4) & (jj < 3 * R // 4))
    mask = jnp.where(inner_sq, jnp.bfloat16(0), jnp.bfloat16(1))

    eb2 = eb[:, None]
    ec2 = ec[None, :]
    stop = (jnp.full((Hi, Wi), jnp.inf, jnp.float32) if t_stop is None
            else t_stop.astype(jnp.float32))

    use_phase = phase is not None
    kern = functools.partial(
        _sweep_kernel, n_src=Rv, interp=interp,
        use_stop=t_stop is not None, use_phase=use_phase)

    slab_specs = [
        pl.BlockSpec(
            (1, 1, 4, RP, RP),
            lambda ht, s, idx_ref, par_ref, misc_ref: (
                idx_ref[s, 0], idx_ref[s, 1], 0, 0, 0),
        ),
    ]
    slab_args = [padded]
    if use_phase:
        slab_specs.append(pl.BlockSpec(
            (1, 1, 4, RP, RP),
            lambda ht, s, idx_ref, par_ref, misc_ref: (
                idx_ref[s, 0], idx_ref[s, 2], 0, 0, 0),
        ))
        slab_args.append(padded)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(HT, S),
        in_specs=slab_specs + [
            pl.BlockSpec(
                (BT, 1),
                lambda ht, s, *_: (ht, 0),
            ),
            pl.BlockSpec((1, Wi), lambda ht, s, *_: (0, 0)),
            pl.BlockSpec((RP, RP), lambda ht, s, *_: (0, 0)),
            pl.BlockSpec((BT, Wi), lambda ht, s, *_: (ht, 0)),
        ],
        out_specs=[
            pl.BlockSpec((3, BT, Wi), lambda ht, s, *_: (0, ht, 0)),
            pl.BlockSpec((BT, Wi), lambda ht, s, *_: (ht, 0)),
            pl.BlockSpec((BT, Wi), lambda ht, s, *_: (ht, 0)),
            pl.BlockSpec((BT, Wi), lambda ht, s, *_: (ht, 0)),
        ],
    )

    C, T, bw, bt = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, Hi, Wi), jnp.float32),
            jax.ShapeDtypeStruct((Hi, Wi), jnp.float32),
            jax.ShapeDtypeStruct((Hi, Wi), jnp.float32),
            jax.ShapeDtypeStruct((Hi, Wi), jnp.float32),
        ],
        interpret=interpret,
    )(idx, par, misc, *slab_args, eb2, ec2, mask, stop)

    op = 1.0 - T  # op accumulates T*alpha == 1 - prod(1-alpha) exactly
    return C.transpose(1, 2, 0), op, T, bt

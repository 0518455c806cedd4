"""Fused Pallas shade kernel: the sweep prep (dense per-vertex decode ->
SH -> color MLP -> premultiply) in ONE kernel.

Why (r5 stage split, tools/profile_sweep_split.py): the XLA scan prep
costs 159 ms/frame — not FLOPs (the whole pass is ~0.2 TFLOP) but HBM
round-trips of every intermediate between fusion groups (~70-95 GB/frame:
XLA cannot fuse through the two MLP matmuls, so decoded features, SH
basis, and both hidden activations each hit HBM).  This kernel keeps the
entire per-vertex chain in VMEM.

Layout insight: put the CHANNELS in sublanes and the VERTICES in lanes.
A block shades B vertices as (16, B) field rows; the MLP input stacks to
X (32, B) and every layer is a clean 2-D MXU dot W^T @ X — no reshapes,
no transposes, no gathers anywhere:

    table   (P, 16, NPP) i16   P = K*(R+1) vertex planes, field-major,
                               in-plane flattened j*384 + k (padded)
    block   (1, 16, B)         one plane slice of B vertices
    X       (32, B)  = [SH16(view dir); decoded features16]
    h       (64, B)  = relu(W1t @ X) ... -> rgb (3, B) -> out (4, B)

The output IS the axis-0-oriented, 384-padded composite input
(K, R+1, 4, 384, 384) after a free contiguous reshape — prep and
composite share one volume with zero relayout for the dominant camera
octants.  In-plane (j, k) come from an f32 lane-iota divide (exact: the
quotient error bound ~3e-5 is far under the 1/768 decision margin).

Spec being reproduced: engines/nerf_sweep._shade_planes (the XLA scan
prep), itself the dense-shading form of the reference's per-sample
network eval (testbed_nerf.cu:2022-2145).  Equality:
tests/test_shade_pallas.py (interpret mode + TPU A/B in NOTES_ROUND5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

JP = 384          # padded in-plane rows (j) and lanes (k)
NPP = JP * JP     # flattened padded in-plane size


_SH_C = dict(
    c0=0.28209479177387814, c1=0.48860251190291987,
    c2a=1.0925484305920792, c2b=0.94617469575755997,
    c2c=0.31539156525251999, c2d=0.54627421529603959,
    c3a=0.59004358992664352, c3b=2.8906114426405538,
    c3c=0.45704579946446572, c3d=0.3731763325901154,
    c3e=1.4453057213202769,
)


def _sh16_rows(x, y, z):
    """tcnn SH basis deg 4 on (1, B) coordinate rows -> list of 16 rows
    (matches ops/encodings.sh_encode exactly)."""
    C = _SH_C
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    one = jnp.ones_like(x)
    return [
        C["c0"] * one,
        -C["c1"] * y, C["c1"] * z, -C["c1"] * x,
        C["c2a"] * xy, -C["c2a"] * yz,
        C["c2b"] * z2 - C["c2c"], -C["c2a"] * xz,
        C["c2d"] * (x2 - y2),
        C["c3a"] * y * (-3.0 * x2 + y2),
        C["c3b"] * xy * z,
        C["c3c"] * y * (1.0 - 5.0 * z2),
        C["c3d"] * z * (5.0 * z2 - 3.0),
        C["c3c"] * x * (1.0 - 5.0 * z2),
        C["c3e"] * z * (x2 - y2),
        C["c3a"] * x * (-x2 + 3.0 * y2),
    ]


def _shade_kernel(
    # scalar prefetch
    scale_ref,    # (K*F,) f32 per-(cascade, field) dequant scale
    cam_ref,      # (3,) f32 camera origin (world/engine coords)
    # VMEM: tbl_ref (1, F, B) i16 plane slice; then n_w transposed
    # zero-padded MLP weights (out_pad, in_pad) bf16; then the output
    # out_ref (1, 4, B) bf16 premultiplied [s*r, s*g, s*b, s]
    *refs,
    R: int,
    n_fields: int,
    block: int,
    n_w: int,
    density_act: str,
    rgb_act: str,
):
    tbl_ref = refs[0]
    w_refs = refs[1:1 + n_w]
    out_ref = refs[1 + n_w]
    Rv = R + 1
    p = pl.program_id(0)
    q = pl.program_id(1)
    m = p // Rv
    i = p - m * Rv

    # lane-blocks past j = R are 100% padding (flat index v = j*JP + k,
    # valid j < Rv): skip the whole decode->SH->MLP chain there and emit
    # zeros — 2 of 8 blocks at R=256/block=18432, ~25% of the shade FLOPs.
    # The composite's resample weights for those source rows are zero, but
    # the buffer must still be NaN-free, hence the explicit zero write.
    n_valid = Rv * JP

    @pl.when(q * block >= n_valid)
    def _pad_block():
        out_ref[0] = jnp.zeros((4, block), jnp.bfloat16)

    @pl.when(q * block < n_valid)
    def _live_block():
        _shade_block(tbl_ref, w_refs, out_ref, scale_ref, cam_ref,
                     m, i, q, R=R, n_fields=n_fields, block=block,
                     n_w=n_w, density_act=density_act, rgb_act=rgb_act)


def _shade_block(tbl_ref, w_refs, out_ref, scale_ref, cam_ref, m, i, q, *,
                 R, n_fields, block, n_w, density_act, rgb_act):
    blk = tbl_ref[0]  # (F, B) i16
    # sentinel mask as f32 arithmetic: 1-sublane i1 vectors hit Mosaic's
    # unimplemented sublane-broadcast path, so no bools anywhere here.
    # blk values are integers, so clamp01(2*(-v - 32767.5)) is EXACTLY 1
    # at -32768 and 0 elsewhere.
    blk0f = blk[0:1, :].astype(jnp.float32)
    sentf = jnp.clip(2.0 * (-blk0f - 32767.5), 0.0, 1.0)  # (1, B)

    rows = []
    for f in range(n_fields):
        rows.append(blk[f:f + 1, :].astype(jnp.float32)
                    * scale_ref[m * n_fields + f])
    raw = jnp.concatenate(rows, axis=0)  # (F, B) f32

    if density_act == "exponential":
        dens = jnp.exp(jnp.clip(raw[0:1, :], -15.0, 15.0))
    elif density_act == "relu":
        dens = jnp.maximum(raw[0:1, :], 0.0)
    elif density_act == "logistic":
        dens = jax.nn.sigmoid(raw[0:1, :])
    else:
        dens = raw[0:1, :]

    # in-plane coords from the flat lane index (f32 divide: exact at this
    # range — quotient error ~3e-5 vs the 1/768 decision margin)
    v = (jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
         .astype(jnp.float32) + jnp.float32(block) * q.astype(jnp.float32))
    jf = jnp.floor((v + 0.5) / JP)
    kf = v - JP * jf
    # bool-free validity: jf/kf integer-valued, so clamp01(R+0.5-jf) is
    # exactly 1 inside the cube and 0 in the padding
    okj = jnp.clip(R + 0.5 - jf, 0.0, 1.0)
    okk = jnp.clip(R + 0.5 - kf, 0.0, 1.0)
    dens = dens * (okj * okk * (1.0 - sentf))

    side = jnp.exp2(m.astype(jnp.float32))
    lo = 0.5 - 0.5 * side
    px = i.astype(jnp.float32) / R * side + lo      # scalar
    py = jf / R * side + lo                          # (1, B)
    pz = kf / R * side + lo
    dx = px - cam_ref[0]
    dy = py - cam_ref[1]
    dz = pz - cam_ref[2]
    n = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    n = jnp.maximum(n, 1e-6)
    # sh_encode convention: dirs warped to [0,1] then back — identical to
    # feeding the unit direction straight in
    x, y, z = dx / n, dy / n, dz / n

    sh = _sh16_rows(x, y, z)
    h = jnp.concatenate(sh + [raw], axis=0).astype(jnp.bfloat16)  # (32, B)

    # ReLU MLP, any depth: weights are transposed and zero-padded to
    # sublane multiples, so padded rows stay exactly zero through relu
    for wi in range(n_w):
        h = jnp.dot(w_refs[wi][...], h, preferred_element_type=jnp.float32)
        if wi < n_w - 1:
            h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    rgbr = h[:3, :]  # (3, B)
    if rgb_act == "logistic":
        rgb = jax.nn.sigmoid(rgbr)
    elif rgb_act == "exponential":
        rgb = jnp.exp(jnp.clip(rgbr, -10.0, 10.0))
    elif rgb_act == "relu":
        rgb = jnp.maximum(rgbr, 0.0)
    else:
        rgb = rgbr
    # no sublane broadcast on Mosaic: replicate the density row explicitly
    dens3 = jnp.concatenate([dens, dens, dens], axis=0)  # (3, B)
    out = jnp.concatenate([rgb * dens3, dens], axis=0)   # (4, B)
    out_ref[0] = out.astype(jnp.bfloat16)


def build_fieldmajor_planes(rows: jnp.ndarray, resolution: int,
                            n_cascades: int) -> jnp.ndarray:
    """(K*(R+1)^3, F/2) int32 int16-packed bake rows -> the kernel's
    (P, F, NPP) int16 field-major padded-plane table.  Camera-independent:
    build ONCE per bake and cache alongside it."""
    R, K = resolution, n_cascades
    Rv = R + 1
    F = rows.shape[-1] * 2
    i16 = jax.lax.bitcast_convert_type(rows, jnp.int16)
    i16 = i16.reshape(K * Rv, Rv, Rv, F)          # (P, j, k, F)
    i16 = jnp.transpose(i16, (0, 3, 1, 2))         # (P, F, j, k)
    i16 = jnp.pad(i16, ((0, 0), (0, 0), (0, JP - Rv), (0, JP - Rv)))
    return i16.reshape(K * Rv, F, NPP)


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "n_cascades", "density_act", "rgb_act",
                     "block", "interpret"),
)
def shade_volume_pallas(
    planes_fm,        # (P, F, NPP) i16 (build_fieldmajor_planes output)
    scale,            # (K, F) f32 dequant scales
    cam_origin,       # (3,) f32
    weights,          # color-MLP weight tuple: [(32,h), (h,h)..., (h,3)]
    *,
    resolution: int,
    n_cascades: int,
    density_act: str = "exponential",
    rgb_act: str = "logistic",
    block: int = 18432,
    interpret: bool = False,
):
    """-> (K, R+1, 4, JP, JP) bf16 premultiplied rgba volume, 384-padded,
    slab-major along WORLD AXIS 0 — directly the fused composite's padded
    input for axis-0 camera octants."""
    interpret = interpret or jax.default_backend() != "tpu"
    R, K = resolution, n_cascades
    Rv = R + 1
    P, F, _ = planes_fm.shape
    assert NPP % block == 0, (NPP, block)
    NB = NPP // block

    n_w = len(weights)
    kern = functools.partial(
        _shade_kernel, R=R, n_fields=F, block=block, n_w=n_w,
        density_act=density_act, rgb_act=rgb_act)

    def pad8(n):
        return -(-n // 8) * 8

    wts, prev_pad = [], None
    for wi, w in enumerate(weights):
        wt = w.T  # (out, in)
        rpad = pad8(wt.shape[0]) - wt.shape[0]
        cpad = (prev_pad - wt.shape[1]) if prev_pad else 0
        wt = jnp.pad(wt, ((0, rpad), (0, cpad))).astype(jnp.bfloat16)
        prev_pad = wt.shape[0]
        wts.append(wt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, NB),
        in_specs=[pl.BlockSpec((1, F, block), lambda p, q, *_: (p, 0, q))]
        + [pl.BlockSpec(w.shape, lambda p, q, *_: (0, 0)) for w in wts],
        out_specs=pl.BlockSpec((1, 4, block), lambda p, q, *_: (p, 0, q)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 4, NPP), jnp.bfloat16),
        interpret=interpret,
    )(scale.reshape(-1), jnp.asarray(cam_origin, jnp.float32),
      planes_fm, *wts)
    return out.reshape(K, Rv, 4, JP, JP)

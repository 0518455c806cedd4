"""Slab-sweep (shear-warp) frame renderer over the baked feature grid.

The gather-free sibling of engines/nerf_baked.py (rationale + math:
ops/sweep.py).  Per frame:

1. `prepare_rgba_volume` — dense per-vertex shading pass: dequantize the
   baked int16 rows (streamed slab-by-slab, no gathers), run the color MLP
   once per vertex with the vertex's own to-camera direction (EXACT for
   primary rays: the viewing direction at a 3D point is
   normalize(p - cam_origin) for every pixel whose ray passes through it),
   and store a premultiplied (sigma*rgb, sigma) bf16 volume.  One big MXU
   pass — the per-candidate color MLP of the gather renderer disappears.
2. Orient the volume so the sweep axis (dominant camera axis, chosen on
   host) is slab-major ascending, sweep-composite all cascade slabs front
   to back (ops/sweep.sweep_composite), and projectively warp the
   intermediate image onto the output pixels.

Live-path spec being reproduced: render_nerf ray init/epilogue
(/root/reference/src/testbed_nerf.cu:1428-1558) and the same volume
integral as NerfTracer::trace (:2022-2145) on uniform pitch-1 steps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sienerf_tpu.models.nerf_network import (
    apply_density_activation,
    apply_rgb_activation,
)
from sienerf_tpu.ops.baked import _decode_rows, row_bits
from sienerf_tpu.ops.encodings import sh_encode
from sienerf_tpu.ops.mlp import mlp_apply
from sienerf_tpu.ops.sweep import (
    canon_coords,
    orient_grid,
    sweep_composite,
    warp_to_pixels,
)

E_MAX = 16.0  # gnomonic clamp: rays >~86 deg off-axis render as background
# (masked via `good` below — they would otherwise sample the clamped edge
# of the intermediate image; at normal FOVs no ray comes close)


import os as _os

# measured on TPU (tools/profile_sweep_split.py): CH=1 158.6 ms,
# CH=4 165, CH=16 209 — the per-plane scan keeps each step's
# intermediates VMEM/cache-local; bigger chunks spill to HBM.
_SHADE_CHUNK = int(_os.environ.get("SIENERF_SWEEP_CHUNK", "1"))


def _shade_planes(engine, params, planes, casc, iplane, scale, cam_origin,
                  resolution: int, n_cascades: int, chunk: int | None = None):
    """Scan-shade a stack of vertex planes: (P, (R+1)^2, F/2|F/4) rows ->
    (P, (R+1)^2, 4) bf16 premultiplied rgba (the shared unit behind the
    single-device and plane-sharded prep).

    `chunk` planes shade per scan step; 1 is the measured TPU optimum
    (bigger chunks spill the fused intermediates to HBM — see
    _SHADE_CHUNK note)."""
    R, K = resolution, n_cascades
    Rv = R + 1
    P = planes.shape[0]
    CH = max(1, min(_SHADE_CHUNK if chunk is None else chunk, P))
    Pp = -(-P // CH) * CH
    if Pp > P:
        planes = jnp.concatenate(
            [planes,
             jnp.broadcast_to(planes[:1], (Pp - P,) + planes.shape[1:])])
        casc = jnp.concatenate([casc, jnp.zeros(Pp - P, casc.dtype)])
        iplane = jnp.concatenate([iplane, jnp.zeros(Pp - P, iplane.dtype)])
    bits = row_bits(planes)
    extra = None
    if engine.net.n_extra_dims:
        extra = engine._render_extra(params)
        if extra is None:
            extra = jnp.zeros((engine.net.n_extra_dims,), jnp.float32)

    M = CH * Rv * Rv
    jj = jnp.tile((jnp.arange(Rv * Rv, dtype=jnp.int32) // Rv), CH)
    kk = jnp.tile((jnp.arange(Rv * Rv, dtype=jnp.int32) % Rv), CH)
    jjf, kkf = jj.astype(jnp.float32), kk.astype(jnp.float32)

    def one_chunk(carry, xs):
        pl, m, i = xs  # (CH, Rv^2, Fq), (CH,), (CH,)
        rowsf = pl.reshape(M, pl.shape[-1])
        m_r = jnp.repeat(m, Rv * Rv)               # (M,)
        i_r = jnp.repeat(i, Rv * Rv).astype(jnp.float32)
        side = jnp.exp2(m_r.astype(jnp.float32))   # (M,)
        lo = 0.5 - 0.5 * side
        pos = (jnp.stack([i_r, jjf, kkf], axis=-1) / R * side[:, None]
               + lo[:, None])                      # (M, 3)
        # K-way select, NOT a gather: a (M,) row gather from the tiny
        # scale table is 1M descriptors/chunk (measured 2x the whole prep)
        sc = jnp.zeros((M, scale.shape[-1]), jnp.float32)
        for k in range(K):
            sc = jnp.where((m_r == k)[:, None], scale[k], sc)
        raw, sent = _decode_rows(rowsf, sc, bits)
        dens = jnp.where(
            sent, 0.0,
            apply_density_activation(raw[:, 0], engine.net.density_activation)
        )
        dvec = pos - cam_origin
        dvec = dvec / jnp.maximum(
            jnp.linalg.norm(dvec, axis=-1, keepdims=True), 1e-6
        )
        sh = sh_encode((dvec + 1.0) * 0.5, engine.net.sh_degree)
        parts = [sh]
        if extra is not None:
            parts.append(jnp.broadcast_to(extra, (sh.shape[0], extra.shape[0])))
        parts.append(raw)
        rgb_raw = mlp_apply(
            engine.net.rgb_mlp, params["rgb_mlp"], jnp.concatenate(parts, axis=-1)
        )
        rgb = apply_rgb_activation(rgb_raw, engine.net.rgb_activation)
        out = jnp.concatenate(
            [rgb * dens[:, None], dens[:, None]], axis=-1
        ).astype(jnp.bfloat16)
        return carry, out.reshape(CH, Rv * Rv, 4)

    _, vol = jax.lax.scan(
        one_chunk, None,
        (planes.reshape(Pp // CH, CH, Rv * Rv, planes.shape[-1]),
         casc.reshape(Pp // CH, CH),
         iplane.reshape(Pp // CH, CH)))
    return vol.reshape(Pp, Rv * Rv, 4)[:P]


def prepare_rgba_volume(engine, params, rows, scale, cam_origin,
                        resolution: int, n_cascades: int):
    """(K*(R+1)^3, F/2) baked rows -> (K, R+1, R+1, R+1, 4) bf16
    premultiplied [s*r, s*g, s*b, s] volume, shaded for `cam_origin`.

    Streams the table in layout order (one (R+1)^2 plane per scan step):
    zero gathers, one dense MLP pass over every vertex."""
    R, K = resolution, n_cascades
    Rv = R + 1
    planes = rows.reshape(K * Rv, Rv * Rv, rows.shape[-1])
    casc = jnp.repeat(jnp.arange(K, dtype=jnp.int32), Rv)
    iplane = jnp.tile(jnp.arange(Rv, dtype=jnp.int32), K)
    vol = _shade_planes(engine, params, planes, casc, iplane, scale,
                        cam_origin, R, K)
    return vol.reshape(K, Rv, Rv, Rv, 4)


def prepare_rgba_volume_sharded(engine, params, rows, scale, cam_origin,
                                resolution: int, n_cascades: int, mesh):
    """Plane-sharded prep: the K*(R+1) vertex planes split evenly over the
    `rays` mesh axis (pad planes shade garbage into discarded rows); each
    device shades its contiguous plane range locally — the volume bake is
    embarrassingly parallel.  SURVEY.md §2.9."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    R, K = resolution, n_cascades
    Rv = R + 1
    ndev = mesh.devices.size
    P_total = K * Rv
    pad_to = -(-P_total // ndev) * ndev
    planes = rows.reshape(P_total, Rv * Rv, rows.shape[-1])
    if pad_to > P_total:
        planes = jnp.concatenate(
            [planes, jnp.broadcast_to(planes[:1], (pad_to - P_total,) + planes.shape[1:])]
        )
    casc = jnp.repeat(jnp.arange(K, dtype=jnp.int32), Rv)
    iplane = jnp.tile(jnp.arange(Rv, dtype=jnp.int32), K)
    casc = jnp.concatenate([casc, jnp.zeros(pad_to - P_total, jnp.int32)])
    iplane = jnp.concatenate([iplane, jnp.zeros(pad_to - P_total, jnp.int32)])

    fn = shard_map(
        lambda pl, ca, ip, p, sc, co: _shade_planes(
            engine, p, pl, ca, ip, sc, co, R, K
        ),
        mesh=mesh,
        in_specs=(P("rays"), P("rays"), P("rays"), P(), P(), P()),
        out_specs=P("rays"),
        check_vma=False,
    )
    vol = fn(planes, casc, iplane, params, scale, cam_origin)
    return vol[:P_total].reshape(K, Rv, Rv, Rv, 4)


@partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=(
        "width", "height", "resolution", "n_cascades", "axis", "flip",
        "hi", "wi", "unroll", "interp", "group", "impl", "packed",
    ),
)
def _render_frame_sweep_impl(
    engine, params, rows, scale, camera_matrix, focal_length,
    *, width: int, height: int, resolution: int, n_cascades: int,
    axis: int, flip: bool, hi: int, wi: int,
    screen_center=(0.5, 0.5), background=(0.0, 0.0, 0.0),
    min_transmittance=None, pixel_offset=None, unroll: int = 1,
    interp: str = "nearest", group: int = 1, impl: str = "xla",
    axis_phase=None, packed: bool = False, rows_fm=None,
):
    from sienerf_tpu.common import NERF_RENDERING_NEAR_DISTANCE

    n = width * height
    if pixel_offset is None:
        pixel_offset = jnp.asarray([0.5, 0.5], jnp.float32)
    cam_spec = (width, height, focal_length, camera_matrix, screen_center,
                pixel_offset)
    ids = jnp.arange(n, dtype=jnp.int32)
    o, d_n, dn, _, _ = engine._frame_make_rays(ids, n, cam_spec)
    minT = jnp.asarray(
        engine.render_min_transmittance if min_transmittance is None
        else min_transmittance, jnp.float32,
    )
    near = max(NERF_RENDERING_NEAR_DISTANCE, engine.near_distance)

    o_c = canon_coords(o[0], axis, flip, True)
    d_c = canon_coords(d_n, axis, flip, False)
    e_raw = d_c[:, 1:] / jnp.maximum(d_c[:, 0:1], 1e-3)
    good = (d_c[:, 0] > 1e-3) & jnp.all(jnp.abs(e_raw) <= E_MAX, axis=-1)
    e_px = jnp.clip(e_raw, -E_MAX, E_MAX)
    e_ok = jnp.where(good[:, None], e_px, 0.0)
    big = jnp.float32(1e9)
    elo = jnp.min(jnp.where(good[:, None], e_ok, big), axis=0)
    ehi = jnp.max(jnp.where(good[:, None], e_ok, -big), axis=0)
    span = jnp.maximum(ehi - elo, 1e-3)
    deb = span[0] / (hi - 2)
    dec = span[1] / (wi - 2)
    eb = elo[0] + (jnp.arange(hi, dtype=jnp.float32) - 0.5) * deb
    ec = elo[1] + (jnp.arange(wi, dtype=jnp.float32) - 0.5) * dec

    if impl == "pallas" and rows_fm is not None:
        # fully fused prep: the shade kernel emits the axis-0-oriented,
        # 384-padded composite input directly (ops/shade_pallas.py); the
        # canonical flip rides the composite's schedule (data_flip), so
        # the only remaining volume op is the axis 1/2 transpose.
        from sienerf_tpu.ops.shade_pallas import JP, shade_volume_pallas
        from sienerf_tpu.ops.sweep_pallas import sweep_composite_pallas

        Rv = resolution + 1
        volp = shade_volume_pallas(
            rows_fm, scale, o[0], tuple(params["rgb_mlp"]),
            resolution=resolution, n_cascades=n_cascades,
            density_act=engine.net.density_activation.name.lower(),
            rgb_act=engine.net.rgb_activation.name.lower(),
        )
        if axis == 0:
            pv = volp
        elif axis == 1:
            pv = jnp.pad(jnp.transpose(volp, (0, 3, 2, 1, 4)),
                         ((0, 0), (0, 0), (0, 0), (0, JP - Rv), (0, 0)))
        else:
            pv = jnp.pad(jnp.transpose(volp, (0, 4, 2, 1, 3)),
                         ((0, 0), (0, 0), (0, 0), (0, JP - Rv), (0, 0)))
        C, op, T, bt = sweep_composite_pallas(
            pv, None, o_c, eb, ec, near, minT, phase=axis_phase,
            resolution=resolution, n_cascades=n_cascades, interp=interp,
            prepadded=True, data_flip=flip,
        )
    elif impl == "pallas":
        vol = prepare_rgba_volume(
            engine, params, rows, scale, o[0], resolution, n_cascades
        )
        oriented = orient_grid(vol, axis, flip)
        slab_live = jnp.any(oriented[:, :, 3] > 0, axis=(2, 3))
        from sienerf_tpu.ops.sweep_pallas import sweep_composite_pallas

        C, op, T, bt = sweep_composite_pallas(
            oriented, slab_live, o_c, eb, ec, near, minT,
            phase=axis_phase,
            resolution=resolution, n_cascades=n_cascades, interp=interp,
        )
    else:
        vol = prepare_rgba_volume(
            engine, params, rows, scale, o[0], resolution, n_cascades
        )
        oriented = orient_grid(vol, axis, flip)
        slab_live = jnp.any(oriented[:, :, 3] > 0, axis=(2, 3))
        C, op, T, bt = sweep_composite(
            oriented, slab_live, o_c, eb, ec, near, minT,
            phase=axis_phase,
            resolution=resolution, n_cascades=n_cascades, unroll=unroll,
            interp=interp, group=group,
        )
    maps = jnp.concatenate([C, op[..., None], bt[..., None]], axis=-1)
    outs = warp_to_pixels(maps, e_px, eb[0], deb, ec[0], dec)
    rgb = jnp.where(good[:, None], outs[:, :3], 0.0)
    opacity = jnp.where(good, jnp.clip(outs[:, 3], 0.0, 1.0), 0.0)
    depth = jnp.where(good, outs[:, 4], 0.0) / jnp.maximum(dn, 1e-9)

    bg = jnp.asarray(background, jnp.float32)
    if "envmap" in params:
        from sienerf_tpu.ops.envmap import read_envmap

        ev = read_envmap(params["envmap"], d_n)
        bg_full = ev[:, :3] + bg[None, :] * (1.0 - ev[:, 3:4])
        rgb = rgb + (1.0 - opacity)[:, None] * bg_full
    else:
        rgb = rgb + (1.0 - opacity)[:, None] * bg
    rgba = jnp.concatenate([rgb, opacity[:, None]], axis=-1)
    if packed:
        # ONE channel-major (5, H, W) f32 boundary array: ANY (n, 4|5)
        # materialization tile-pads its minor dim up to 25x (~470 MB per
        # plane set — measured ~67+ ms/frame, r5); channel-major rows are
        # lane-aligned so the epilogue fusion writes the output directly.
        out5 = jnp.stack([rgba[:, 0], rgba[:, 1], rgba[:, 2], rgba[:, 3],
                          depth], axis=0)
        return out5.reshape(5, height, width)
    return rgba.reshape(height, width, 4), depth.reshape(height, width)


def _align(x: int, m: int = 128) -> int:
    return -(-int(x) // m) * m


def _pick_axis(camera_matrix, focal_length, width, height,
               screen_center=(0.5, 0.5)):
    """Sweep axis/flip from the central view ray — PURE HOST numpy.

    The r4 wrapper ran uv_to_ray on device and fetched one ray per frame
    call: on the tunneled box that is a ~30 ms RTT AND a pipeline sync per
    frame (measured: 190 -> 420+ ms/frame).  The axis pick only needs the
    dominant axis of the pinhole center direction, so lens distortion is
    irrelevant here."""
    cam = np.asarray(camera_matrix, np.float32)
    sc = np.asarray(screen_center, np.float32)
    fl = np.asarray(focal_length, np.float32)
    x = (0.5 - sc[0]) * width / fl[0]
    y = (0.5 - sc[1]) * height / fl[1]
    d0 = cam[:3, :3] @ np.asarray([x, y, 1.0], np.float32)
    axis = int(np.argmax(np.abs(d0)))
    return axis, bool(d0[axis] < 0)



@partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=(
        "width", "height", "resolution", "n_cascades", "axis", "flip",
        "hi", "wi", "mesh", "interp",
    ),
)
def _render_frame_sweep_multichip_impl(
    engine, params, rows, scale, camera_matrix, focal_length,
    *, width: int, height: int, resolution: int, n_cascades: int,
    axis: int, flip: bool, hi: int, wi: int, mesh,
    screen_center=(0.5, 0.5), background=(0.0, 0.0, 0.0),
    min_transmittance=None, pixel_offset=None, interp: str = "nearest",
):
    """Multichip slab-sweep frame: prep sharded over vertex planes,
    composite sharded over slab ranges (associative over-fold —
    ops/sweep.sweep_composite_sharded), warp/epilogue replicated.  Exactly
    the single-chip pipeline rearranged along the mesh; at
    min_transmittance=0 the fold is bit-faithful to the single-chip frame
    up to f32 reassociation."""
    from sienerf_tpu.common import NERF_RENDERING_NEAR_DISTANCE
    from sienerf_tpu.ops.sweep import sweep_composite_sharded

    n = width * height
    if pixel_offset is None:
        pixel_offset = jnp.asarray([0.5, 0.5], jnp.float32)
    cam_spec = (width, height, focal_length, camera_matrix, screen_center,
                pixel_offset)
    ids = jnp.arange(n, dtype=jnp.int32)
    o, d_n, dn, _, _ = engine._frame_make_rays(ids, n, cam_spec)
    minT = jnp.asarray(
        engine.render_min_transmittance if min_transmittance is None
        else min_transmittance, jnp.float32,
    )
    near = max(NERF_RENDERING_NEAR_DISTANCE, engine.near_distance)
    o_c = canon_coords(o[0], axis, flip, True)
    d_c = canon_coords(d_n, axis, flip, False)
    e_raw = d_c[:, 1:] / jnp.maximum(d_c[:, 0:1], 1e-3)
    good = (d_c[:, 0] > 1e-3) & jnp.all(jnp.abs(e_raw) <= E_MAX, axis=-1)
    e_px = jnp.clip(e_raw, -E_MAX, E_MAX)
    e_ok = jnp.where(good[:, None], e_px, 0.0)
    big = jnp.float32(1e9)
    elo = jnp.min(jnp.where(good[:, None], e_ok, big), axis=0)
    ehi = jnp.max(jnp.where(good[:, None], e_ok, -big), axis=0)
    span = jnp.maximum(ehi - elo, 1e-3)
    deb = span[0] / (hi - 2)
    dec = span[1] / (wi - 2)
    eb = elo[0] + (jnp.arange(hi, dtype=jnp.float32) - 0.5) * deb
    ec = elo[1] + (jnp.arange(wi, dtype=jnp.float32) - 0.5) * dec

    vol = prepare_rgba_volume_sharded(
        engine, params, rows, scale, o[0], resolution, n_cascades, mesh
    )
    oriented = orient_grid(vol, axis, flip)
    slab_live = jnp.any(oriented[:, :, 3] > 0, axis=(2, 3))
    C, op, T, bt = sweep_composite_sharded(
        mesh, oriented, slab_live, o_c, eb, ec, near, minT,
        resolution=resolution, n_cascades=n_cascades, interp=interp,
    )
    maps = jnp.concatenate([C, op[..., None], bt[..., None]], axis=-1)
    outs = warp_to_pixels(maps, e_px, eb[0], deb, ec[0], dec)
    rgb = jnp.where(good[:, None], outs[:, :3], 0.0)
    opacity = jnp.where(good, jnp.clip(outs[:, 3], 0.0, 1.0), 0.0)
    depth = jnp.where(good, outs[:, 4], 0.0) / jnp.maximum(dn, 1e-9)
    bg = jnp.asarray(background, jnp.float32)
    if "envmap" in params:
        from sienerf_tpu.ops.envmap import read_envmap

        ev = read_envmap(params["envmap"], d_n)
        bg_full = ev[:, :3] + bg[None, :] * (1.0 - ev[:, 3:4])
        rgb = rgb + (1.0 - opacity)[:, None] * bg_full
    else:
        rgb = rgb + (1.0 - opacity)[:, None] * bg
    rgba = jnp.concatenate([rgb, opacity[:, None]], axis=-1)
    return rgba.reshape(height, width, 4), depth.reshape(height, width)


def render_frame_sweep_multichip(engine, params, grid, meta, camera_matrix,
                                 focal_length, mesh, *, width: int,
                                 height: int, margin: float = 1.15,
                                 hi: int | None = None, wi: int | None = None,
                                 **kw):
    """Multichip full-frame slab-sweep render (see the impl docstring)."""
    if meta["mode"] != "nearest":
        raise ValueError("sweep renderer needs a mode='nearest' bake")
    sc = kw.get("screen_center", (0.5, 0.5))
    axis, flip = _pick_axis(camera_matrix, focal_length, width, height, sc)
    hi = hi or _align(margin * height)
    wi = wi or _align(margin * width)
    return _render_frame_sweep_multichip_impl(
        engine, params, grid["rows"], grid["scale"], camera_matrix,
        focal_length, width=width, height=height,
        resolution=meta["resolution"], n_cascades=meta["n_cascades"],
        axis=axis, flip=flip, hi=hi, wi=wi, mesh=mesh, **kw,
    )


def _fused_prep_eligible(engine, grid) -> bool:
    """The fused shade kernel covers the standard nerf config (16-bit
    bake, SH deg 4, 32->64->64->3 ReLU color MLP, no extra dims); anything
    else falls back to the XLA scan prep inside the pallas frame."""
    net = engine.net
    mlp = net.rgb_mlp
    return (
        grid["rows"].shape[-1] * 2 == 16
        and net.n_extra_dims == 0
        and net.sh_degree == 4
        and mlp.n_input_dims == 32
        and mlp.activation.lower() == "relu"
        and mlp.output_activation.lower() == "none"
        and net.density_activation.name.lower() in (
            "exponential", "relu", "logistic")
        and net.rgb_activation.name.lower() in (
            "logistic", "exponential", "relu")
    )


def render_frame_sweep(engine, params, grid, meta, camera_matrix,
                       focal_length, *, width: int, height: int,
                       margin: float = 1.15, hi: int | None = None,
                       wi: int | None = None, impl: str = "auto",
                       packed: bool = False, **kw):
    """Full-frame slab-sweep render -> (rgba (H,W,4), depth (H,W)), or ONE
    packed (H, W*5) array when `packed=True` (view it as (H, W, 5):
    [..., :4] rgba, [..., 4] depth — the fast boundary layout).

    `grid`/`meta` are bake_feature_grid outputs (mode='nearest' — the
    vertex-row table IS the dense volume, streamed in layout order).  The
    sweep axis and flip are chosen host-side from the central view ray, so
    each camera octant compiles once (<= 6 variants per frame geometry).

    `impl`: 'pallas' (fused single-kernel composite, ops/sweep_pallas.py —
    the TPU fast path), 'xla' (lax.scan composite, ops/sweep.py), or
    'auto' (pallas on TPU unless SIENERF_SWEEP_IMPL overrides)."""
    if meta["mode"] != "nearest":
        raise ValueError("sweep renderer needs a mode='nearest' bake")
    if impl == "auto":
        import os

        impl = os.environ.get(
            "SIENERF_SWEEP_IMPL",
            "pallas" if jax.default_backend() == "tpu" else "xla")
    sc = kw.get("screen_center", (0.5, 0.5))
    axis, flip = _pick_axis(camera_matrix, focal_length, width, height, sc)
    hi = hi or _align(margin * height)
    wi = wi or _align(margin * width)
    rows_fm = None
    if impl == "pallas" and _fused_prep_eligible(engine, grid):
        rows_fm = grid.get("rows_fm")
        if rows_fm is None:
            # camera-independent field-major table: build once per bake
            # and cache on the grid dict
            from sienerf_tpu.ops.shade_pallas import build_fieldmajor_planes

            rows_fm = build_fieldmajor_planes(
                grid["rows"], meta["resolution"], meta["n_cascades"])
            grid["rows_fm"] = rows_fm
    return _render_frame_sweep_impl(
        engine, params, grid["rows"], grid["scale"], camera_matrix,
        focal_length, width=width, height=height,
        resolution=meta["resolution"], n_cascades=meta["n_cascades"],
        axis=axis, flip=flip, hi=hi, wi=wi, impl=impl, packed=packed,
        rows_fm=rows_fm, **kw,
    )

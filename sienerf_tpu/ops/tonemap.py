"""Render-buffer epilogue ops: accumulation, tonemapping, color spaces,
overlays.  Behavioral spec: reference src/render_buffer.cu (accumulate /
tonemap kernels, ACES/Hable/Reinhard curves, sRGB conversion) and
render_frame_epilogue (testbed.cu:4896-5119).
"""

from __future__ import annotations

import jax.numpy as jnp

from sienerf_tpu.common import ColorSpace, TonemapCurve


def srgb_to_linear(c):
    return jnp.where(c <= 0.04045, c / 12.92, jnp.power(jnp.clip((c + 0.055) / 1.055, 1e-8, None), 2.4))


def linear_to_srgb(c):
    c = jnp.clip(c, 0.0, None)
    return jnp.where(c <= 0.0031308, 12.92 * c, 1.055 * jnp.power(jnp.clip(c, 1e-8, None), 1.0 / 2.4) - 0.055)


def tonemap_aces(x):
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def _hable_partial(x):
    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (A * x + C * B) + D * E) / (x * (A * x + B) + D * F)) - E / F


def tonemap_hable(x):
    W = 11.2
    return jnp.clip(_hable_partial(x) / _hable_partial(jnp.float32(W)), 0.0, 1.0)


def tonemap_reinhard(x):
    return x / (1.0 + x)


def apply_tonemap(rgb, curve: TonemapCurve):
    if curve == TonemapCurve.ACES:
        return tonemap_aces(rgb)
    if curve == TonemapCurve.HABLE:
        return tonemap_hable(rgb)
    if curve == TonemapCurve.REINHARD:
        return tonemap_reinhard(rgb)
    return rgb


def accumulate(accum_rgba, frame_rgba, spp: int):
    """Running mean over samples-per-pixel (render_buffer.cu accumulate)."""
    w = 1.0 / (spp + 1)
    return accum_rgba + (frame_rgba - accum_rgba) * w


def tonemap_frame(
    rgba,
    exposure: float = 0.0,
    tonemap_curve: TonemapCurve = TonemapCurve.IDENTITY,
    color_space: ColorSpace = ColorSpace.SRGB,
    clamp_output: bool = True,
):
    """Linear HDR rgba -> display rgba (premultiplied-alpha preserved)."""
    scale = 2.0**exposure
    rgb = rgba[..., :3] * scale
    rgb = apply_tonemap(rgb, tonemap_curve)
    if color_space == ColorSpace.SRGB:
        rgb = linear_to_srgb(rgb)
    if clamp_output:
        rgb = jnp.clip(rgb, 0.0, 1.0)
    return jnp.concatenate([rgb, jnp.clip(rgba[..., 3:4], 0.0, 1.0)], axis=-1)


def error_overlay(rendered_rgb, gt_rgb):
    """False-color per-pixel squared-error map (render_frame_epilogue overlays)."""
    err = jnp.mean((rendered_rgb - gt_rgb) ** 2, axis=-1, keepdims=True)
    e = jnp.log1p(err * 100.0)
    e = e / jnp.maximum(jnp.max(e), 1e-8)
    # simple viridis-ish ramp
    r = jnp.clip(1.5 * e - 0.25, 0.0, 1.0)
    g = jnp.clip(1.5 * (1.0 - jnp.abs(e - 0.5) * 2.0), 0.0, 1.0)
    b = jnp.clip(1.0 - 1.5 * e, 0.0, 1.0)
    return jnp.concatenate([r, g, b], axis=-1)


def hsv_to_rgb(h, s, v):
    """Vectorized HSV -> RGB (common_device.cuh:714-736)."""
    h = jnp.mod(h, 1.0) * 6.0
    i = jnp.floor(h).astype(jnp.int32)
    f = h - i.astype(jnp.float32)
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    conds = [i == k for k in range(6)]
    r = jnp.select(conds, [v, q, p, p, t, v], v)
    g = jnp.select(conds, [t, v, v, q, p, p], p)
    b = jnp.select(conds, [p, p, t, v, v, q], q)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.where(s[..., None] == 0.0, v[..., None], rgb)


def flow_to_rgb(flow):
    """2D vector field -> HSV color wheel (to_rgb, common_device.cuh:737):
    hue = direction, value = magnitude."""
    h = jnp.arctan2(flow[..., 1], flow[..., 0]) / (2.0 * jnp.pi) + 0.5
    mag = jnp.linalg.norm(flow, axis=-1)
    return hsv_to_rgb(h, jnp.ones_like(mag), mag)

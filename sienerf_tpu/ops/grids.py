"""Small grid-sampling helpers: bilinear 2D texture fetch, trainable buffers.

Behavioral spec: reference envmap.cuh:24-50 (lat-long bilinear `read_envmap`),
trainable_buffer.cuh (trainable 2D textures: envmap, distortion map), and
image-mode texture fetch (testbed_image.cu).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample_2d(grid: jnp.ndarray, uv: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    """Sample a (H, W, C) grid at uv in [0,1]^2 with bilinear filtering,
    clamped addressing.  uv: [..., 2] (u along W, v along H)."""
    H, W = grid.shape[0], grid.shape[1]
    if align_corners:
        x = uv[..., 0] * (W - 1)
        y = uv[..., 1] * (H - 1)
    else:
        x = uv[..., 0] * W - 0.5
        y = uv[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)

    g = grid.reshape(H * W, -1)
    f00 = jnp.take(g, y0 * W + x0, axis=0)
    f01 = jnp.take(g, y0 * W + x1, axis=0)
    f10 = jnp.take(g, y1 * W + x0, axis=0)
    f11 = jnp.take(g, y1 * W + x1, axis=0)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        f00 * (1 - fx) * (1 - fy)
        + f01 * fx * (1 - fy)
        + f10 * (1 - fx) * fy
        + f11 * fx * fy
    )
    return out.reshape(uv.shape[:-1] + (grid.shape[-1],))


def nearest_sample_2d(grid: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    H, W = grid.shape[0], grid.shape[1]
    x = jnp.clip((uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((uv[..., 1] * H).astype(jnp.int32), 0, H - 1)
    g = grid.reshape(H * W, -1)
    out = jnp.take(g, y * W + x, axis=0)
    return out.reshape(uv.shape[:-1] + (grid.shape[-1],))


def trilinear_sample_3d(grid: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Sample a (D, H, W, C) grid at pos in [0,1]^3 ([...,3] = x,y,z with
    x along W, y along H, z along D), clamped, cell-centered."""
    D, H, W = grid.shape[0], grid.shape[1], grid.shape[2]
    x = pos[..., 0] * W - 0.5
    y = pos[..., 1] * H - 0.5
    z = pos[..., 2] * D - 0.5
    out = None
    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0
    g = grid.reshape(D * H * W, -1)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi = jnp.clip(x0.astype(jnp.int32) + dx, 0, W - 1)
                yi = jnp.clip(y0.astype(jnp.int32) + dy, 0, H - 1)
                zi = jnp.clip(z0.astype(jnp.int32) + dz, 0, D - 1)
                w = (
                    (fx if dx else 1 - fx)
                    * (fy if dy else 1 - fy)
                    * (fz if dz else 1 - fz)
                )[..., None]
                f = jnp.take(g, (zi * H + yi) * W + xi, axis=0)
                out = f * w if out is None else out + f * w
    return out.reshape(pos.shape[:-1] + (grid.shape[-1],))

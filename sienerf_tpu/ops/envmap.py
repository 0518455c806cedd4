"""Trainable lat-long environment-map background.

Behavioral spec: reference envmap.cuh:24-87 (read_envmap bilinear lookup
with longitude wrap / latitude clamp, deposit_envmap_gradient splat),
testbed.cu:4194-4209 (trainable (W,H,4) buffer built when the dataset
ships an envmap), testbed_nerf.cu:1007-1015 (training composites the
random background BEHIND the envmap: bg' = env.rgb + bg * (1 - env.a)),
:1188-1210 (gradients only from rays whose march completed; alpha channel
receives no gradient), :1526-1527 (render initializes the frame to the
envmap color).

TPU design: the envmap is an ordinary autodiff parameter — the bilinear
read is 4 gathers and its VJP is the reference's gradient splat for free.
The map is small (typically <= 1k x 1k), so the unsorted scatter-add in the
VJP is negligible next to the hash-grid work.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def dir_to_latlong_uv(dirs: jnp.ndarray) -> jnp.ndarray:
    """(N,3) unit directions -> (N,2) [0,1]^2 (u=latitude row, v=longitude).

    Matches the reference's permutation read_envmap(dir) =
    dir_to_spherical_unorm((d.z, -d.x, d.y)) (envmap.cuh:25,
    random_val.cuh:62-72): theta measured from world +y, phi = atan2(-x, z).
    """
    cos_theta = jnp.clip(dirs[:, 1], -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    phi = jnp.arctan2(-dirs[:, 0], dirs[:, 2])
    return jnp.stack([theta / np.pi, phi / (2.0 * np.pi) + 0.5], axis=-1)


def read_envmap(envmap: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear lat-long read: envmap (H, W, 4), dirs (N, 3) unit -> (N, 4).

    Longitude (x) wraps, latitude (y) clamps — envmap.cuh:32-40.
    Differentiable in `envmap`; the VJP is the reference's 4-texel
    gradient splat (deposit_envmap_gradient).
    """
    H, W = envmap.shape[0], envmap.shape[1]
    uv = dir_to_latlong_uv(dirs)
    fx = uv[:, 1] * (W - 1)
    fy = uv[:, 0] * (H - 1)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    wx = (fx - x0)[:, None]
    wy = (fy - y0)[:, None]

    def at(xi, yi):
        xi = jnp.where(xi < 0, xi + W, jnp.where(xi >= W, xi - W, xi))
        yi = jnp.clip(yi, 0, H - 1)
        return jnp.take(envmap.reshape(H * W, -1), yi * W + xi, axis=0)

    return (
        (1 - wx) * (1 - wy) * at(x0, y0)
        + wx * (1 - wy) * at(x0 + 1, y0)
        + (1 - wx) * wy * at(x0, y0 + 1)
        + wx * wy * at(x0 + 1, y0 + 1)
    )


def background_behind_envmap(
    envmap: jnp.ndarray, dirs: jnp.ndarray, bg: jnp.ndarray
) -> jnp.ndarray:
    """Composite a background color BEHIND the envmap (testbed_nerf.cu:1015):
    bg' = env.rgb + bg * (1 - env.a).  bg (N,3) or (3,); returns (N,3).

    The alpha channel receives no gradient, like the reference
    (dL_denvmap[3] = 0, envmap.cuh / testbed_nerf.cu:1208)."""
    import jax

    ev = read_envmap(envmap, dirs)
    a = jax.lax.stop_gradient(ev[:, 3:4])
    return ev[:, :3] + jnp.broadcast_to(bg, ev[:, :3].shape) * (1.0 - a)

"""Low-discrepancy and stratified samplers.

Behavioral spec: reference random_val.cuh (halton/sobol helpers,
fibonacci sphere) and testbed_image.cu:39-75 (per-batch 2D coordinate
sampling modes for image training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def halton(index: jnp.ndarray, base: int) -> jnp.ndarray:
    """Radical inverse of `index` in `base`; index int32 array."""
    n_digits = int(np.ceil(np.log(2**31) / np.log(base)))
    result = jnp.zeros(index.shape, jnp.float32)
    f = 1.0
    i = index
    for _ in range(n_digits):
        f = f / base
        result = result + f * (i % base).astype(jnp.float32)
        i = i // base
    return result


def halton_2d(indices: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([halton(indices, 2), halton(indices, 3)], axis=-1)


def _sobol_directions(n_bits: int = 32) -> np.ndarray:
    """Direction numbers for the first two Sobol dimensions."""
    # dim 0: van der Corput
    v0 = np.array([1 << (31 - i) for i in range(n_bits)], np.uint32)
    # dim 1: primitive polynomial x^2+x+1, m = [1, 3, 5, ...]
    v1 = np.zeros(n_bits, np.uint32)
    v1[0] = 1 << 31
    for i in range(1, n_bits):
        v1[i] = v1[i - 1] ^ (v1[i - 1] >> 1)
    return np.stack([v0, v1])


_SOBOL_DIRS = _sobol_directions()


def sobol_2d(indices: jnp.ndarray) -> jnp.ndarray:
    """First two Sobol dimensions for integer sample indices."""
    dirs = jnp.asarray(_SOBOL_DIRS)  # (2, 32)
    i = indices.astype(jnp.uint32)
    out = []
    for d in range(2):
        acc = jnp.zeros(indices.shape, jnp.uint32)
        for b in range(32):
            bit = (i >> jnp.uint32(b)) & jnp.uint32(1)
            acc = acc ^ (bit * dirs[d, b])
        out.append(acc.astype(jnp.float32) * (1.0 / 4294967296.0))
    return jnp.stack(out, axis=-1)


def stratified_2d(key, n: int, grid: int | None = None) -> jnp.ndarray:
    """n stratified jittered samples in [0,1]^2 over a ~sqrt(n) grid."""
    if grid is None:
        grid = int(np.floor(np.sqrt(n)))
    idx = jnp.arange(n, dtype=jnp.int32)
    cx = (idx % grid).astype(jnp.float32)
    cy = ((idx // grid) % grid).astype(jnp.float32)
    jitter = jax.random.uniform(key, (n, 2))
    return jnp.stack([(cx + jitter[:, 0]) / grid, (cy + jitter[:, 1]) / grid], axis=-1)


def fibonacci_sphere_dirs(n: int) -> np.ndarray:
    """n near-uniform directions on the sphere (random_val.cuh fibonacci dirs);
    used for ray-stab signed-distance queries."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    golden = np.pi * (1.0 + np.sqrt(5.0))
    theta = golden * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)], axis=-1
    ).astype(np.float32)


def ld_pixel_offset(spp: int, snap_to_centers: bool = False):
    """Per-spp low-discrepancy subpixel offset (reference ld_random_pixel_offset)."""
    if snap_to_centers:
        return np.array([0.5, 0.5], np.float32)
    h = halton_2d(jnp.asarray([spp + 1]))[0]
    return np.asarray(h) % 1.0

"""Error-map importance sampling for NeRF training rays.

Behavioral spec: reference testbed_nerf.cu:1778-1840 (construct_cdf_2d/1d),
:3022-3075 (periodic CDF rebuild from accumulated per-pixel loss),
nerf_device.cuh:538-615 (sample_cdf_2d) — per-image low-res error maps
accumulate training loss; rays are then drawn with probability proportional
to error (focus on hard regions).

TPU design: the error map is a pytree leaf (N_img, EH, EW); splats are tiny
scatters (n_rays per step); CDFs are cumsums rebuilt every bundle (cheaper
than the reference's interval-growing schedule and equivalent in effect);
inverse-CDF sampling uses dense comparisons instead of binary search (the
domains are tiny; jnp.searchsorted lowers to while loops on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_error_map(n_images: int, res: int = 32) -> dict:
    return {
        "error": jnp.full((n_images, res, res), 1.0, jnp.float32),
        # per-step decay; slow (half-life ~1400 steps) — texels that stop
        # being sampled must not decay to zero before they can be re-drawn,
        # or sampling collapses onto a shrinking pixel subset
        "decay": jnp.float32(0.9995),
    }


def splat_errors(emap: dict, img_idx, u, v, losses, axis_name=None) -> dict:
    """Accumulate per-ray losses at their (image, uv) locations.

    Under ray sharding (`axis_name`), every chip splats ITS rays and the
    additive deltas are psum'd BEFORE the decayed accumulation, so the
    error map stays bit-identical across chips (a per-chip splat under a
    replicated out-spec would silently diverge — round-3 multichip fix)."""
    n_img, eh, ew = emap["error"].shape
    ex = jnp.minimum((u * ew).astype(jnp.int32), ew - 1)
    ey = jnp.minimum((v * eh).astype(jnp.int32), eh - 1)
    flat = (img_idx * eh + ey) * ew + ex
    # small scatter (n_rays); sorted to stay off the serialized path
    order = jnp.argsort(flat)
    add = jax.ops.segment_sum(
        jnp.take(losses, order),
        jnp.take(flat, order),
        num_segments=n_img * eh * ew,
        indices_are_sorted=True,
    )
    if axis_name is not None:
        add = jax.lax.psum(add, axis_name)
    err = emap["error"].reshape(-1) * emap["decay"] + add
    return {**emap, "error": err.reshape(n_img, eh, ew)}


def _inverse_cdf(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """cdf: (..., K) inclusive-normalized; u: (...,) in [0,1) -> index.

    Dense comparison (K is tiny: <=64)."""
    return jnp.sum(u[..., None] >= cdf, axis=-1).astype(jnp.int32)


def sample_error_map(emap: dict, key, n_rays: int, uniform_frac: float = 0.25):
    """Draw (img_idx, u, v) proportional to accumulated error.

    A `uniform_frac` share of rays stays uniformly distributed — this keeps
    the sampler ergodic (every pixel keeps receiving fresh error estimates;
    a pure-CDF sampler is absorbing and collapses onto the pixels it
    happens to sample early).  The reference gets the same effect from its
    coarse error-map resolution + slow CDF rebuild cadence.
    """
    err = jnp.maximum(emap["error"], 1e-8)
    # uniform floor mixed into the distribution itself
    err = err + uniform_frac * jnp.mean(err)
    n_img, eh, ew = err.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)

    per_img = err.sum(axis=(1, 2))  # (N,)
    cdf_img = jnp.cumsum(per_img) / jnp.sum(per_img)
    img_idx = _inverse_cdf(cdf_img, jax.random.uniform(k1, (n_rays,)))
    img_idx = jnp.minimum(img_idx, n_img - 1)

    rows = err.sum(axis=2)  # (N, EH)
    cdf_row = jnp.cumsum(rows, axis=1) / jnp.sum(rows, axis=1, keepdims=True)
    row_cdf_per_ray = jnp.take(cdf_row, img_idx, axis=0)  # (n_rays, EH)
    ey = _inverse_cdf(row_cdf_per_ray, jax.random.uniform(k2, (n_rays,)))
    ey = jnp.minimum(ey, eh - 1)

    cdf_col = jnp.cumsum(err, axis=2) / jnp.maximum(
        jnp.sum(err, axis=2, keepdims=True), 1e-12
    )  # (N, EH, EW)
    flat_cdf = cdf_col.reshape(n_img * eh, ew)
    col_cdf_per_ray = jnp.take(flat_cdf, img_idx * eh + ey, axis=0)
    ex = _inverse_cdf(col_cdf_per_ray, jax.random.uniform(k3, (n_rays,)))
    ex = jnp.minimum(ex, ew - 1)

    jitter = jax.random.uniform(k4, (n_rays, 2))
    u = (ex.astype(jnp.float32) + jitter[:, 0]) / ew
    v = (ey.astype(jnp.float32) + jitter[:, 1]) / eh
    return img_idx, u, v

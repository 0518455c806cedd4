"""Multiresolution hash-grid encoding (tcnn "HashGrid"/"DenseGrid" equivalent).

This is the L0 workhorse of the whole framework (reference consumes it via
tiny-cuda-nn `Encoding<T>` with otype HashGrid — see configs/nerf/base.json
and SURVEY.md §2.3).  Re-designed for TPU:

- All levels live in one `(n_levels, table_size, n_features)` HBM-resident
  fp32 table; lookups are XLA gathers (which map onto the TPU's native
  dynamic-gather path), not hand-rolled SRAM kernels — the GPU "fully fused"
  trick is a shared-memory locality optimization that does not apply here.
- Fixed shapes: positions come in as `(N, D)` with N padded to a lane
  multiple by callers.
- Backward is a custom VJP: scatter-add into the table (XLA scatter) plus an
  analytic position gradient (needed for camera optimisation and SDF
  analytic normals).

Semantics matched to tcnn grid encoding so reference configs mean the same:
  scale_l   = base_resolution * per_level_scale**l - 1
  res_l     = ceil(scale_l) + 1
  pos_l     = pos * scale_l + 0.5 ;  corner = floor(pos_l), frac = pos_l - corner
  index     = dense stride if res_l**D <= table_size else
              (x * 1) ^ (y * 2654435761) ^ (z * 805459861)  (mod table_size)
Auto-sizing of per_level_scale from a desired finest resolution follows
reference src/testbed.cu:3929-3977.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861, 3674653429)


@dataclass(frozen=True)
class HashGridConfig:
    n_dims: int = 3
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 2.0
    # "Hash" or "Dense"; Dense forces stride indexing at every level (tcnn DenseGrid)
    grid_type: str = "Hash"

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    def level_scale(self, level: int) -> float:
        return self.base_resolution * (self.per_level_scale**level) - 1.0

    def level_resolution(self, level: int) -> int:
        return int(math.ceil(self.level_scale(level))) + 1

    def level_is_dense(self, level: int) -> bool:
        if self.grid_type == "Dense":
            return True
        return self.level_resolution(level) ** self.n_dims <= self.table_size

    @staticmethod
    def from_network_config(enc: dict, n_dims: int = 3, aabb_scale: float = 1.0) -> "HashGridConfig":
        """Build from a tcnn-style encoding dict, with NGP auto per_level_scale.

        Reference reset_network (testbed.cu:3929-3977): when the config omits
        per_level_scale it is derived so the finest level hits
        `2048 * aabb_scale` cells across the unit box.
        """
        n_levels = int(enc.get("n_levels", 16))
        base = int(enc.get("base_resolution", 16))
        if "per_level_scale" in enc:
            pls = float(enc["per_level_scale"])
        else:
            desired = 2048.0 * aabb_scale
            pls = float(np.exp(np.log(desired / base) / max(n_levels - 1, 1)))
        return HashGridConfig(
            n_dims=n_dims,
            n_levels=n_levels,
            n_features_per_level=int(enc.get("n_features_per_level", 2)),
            log2_hashmap_size=int(enc.get("log2_hashmap_size", 19)),
            base_resolution=base,
            per_level_scale=pls,
            grid_type="Dense" if enc.get("otype", "HashGrid").lower().startswith("dense") else "Hash",
        )


def init_hashgrid_params(key, config: HashGridConfig, dtype=jnp.float32):
    """tcnn initializes grid features uniform in [-1e-4, 1e-4]."""
    shape = (config.n_levels, config.table_size, config.n_features_per_level)
    return jax.random.uniform(key, shape, dtype, minval=-1e-4, maxval=1e-4)


def _corner_offsets(n_dims: int) -> np.ndarray:
    """(2^D, D) binary corner offsets."""
    n = 1 << n_dims
    return np.array([[(c >> d) & 1 for d in range(n_dims)] for c in range(n)], np.uint32)


def _level_tables(config: HashGridConfig):
    """Per-level static data as arrays (scanned over, not unrolled)."""
    scales = np.asarray([config.level_scale(l) for l in range(config.n_levels)], np.float32)
    res = np.asarray([config.level_resolution(l) for l in range(config.n_levels)], np.uint32)
    dense = np.asarray([config.level_is_dense(l) for l in range(config.n_levels)], bool)
    return jnp.asarray(scales), jnp.asarray(res), jnp.asarray(dense)


def _level_geometry_dyn(config: HashGridConfig, scale, res, is_dense, pos):
    """Traced per-level geometry (scale/res/is_dense are traced scalars):
    returns idx (N,2^D), weights (N,2^D), per_dim (N,2^D,D), offs, scale."""
    D = config.n_dims
    x = pos.astype(jnp.float32) * scale + 0.5
    x_floor = jnp.floor(x)
    frac = x - x_floor
    resf = res.astype(jnp.float32)
    base = jnp.clip(x_floor, 0.0, resf - 1.0).astype(jnp.uint32)  # (N, D)

    offs = jnp.asarray(_corner_offsets(D))  # (2^D, D)
    corner = jnp.minimum(base[:, None, :] + offs[None, :, :], res - jnp.uint32(1))

    # both index schemes, selected per level (tcnn: dense stride when the
    # level fits in the table, spatial hash otherwise)
    stride_idx = corner[..., 0]
    stride = jnp.uint32(1)
    for d in range(1, D):
        stride = stride * res
        stride_idx = stride_idx + corner[..., d] * stride
    hash_idx = corner[..., 0] * jnp.uint32(_PRIMES[0])
    for d in range(1, D):
        hash_idx = hash_idx ^ (corner[..., d] * jnp.uint32(_PRIMES[d]))
    idx = jnp.where(is_dense, stride_idx, hash_idx)
    idx = (idx & jnp.uint32(config.table_size - 1)).astype(jnp.int32)

    f = frac[:, None, :]
    per_dim = jnp.where(offs[None, :, :] == 1, f, 1.0 - f)  # (N, 2^D, D)
    w = jnp.prod(per_dim, axis=-1)  # (N, 2^D)
    return idx, w, per_dim, offs


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def hashgrid_encode(config: HashGridConfig, table: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Encode positions. table: (L, T, F) fp32; pos: (N, D) in [0,1]^D.

    Returns (N, L*F) float32 features (cast downstream as needed).
    Levels are processed with `lax.scan` (compile-time matters on TPU: an
    unrolled 16-level fwd+bwd graph over multi-million-point batches blows
    up XLA compile time).
    """
    out, _ = _encode_fwd_impl(config, table, pos)
    return out


def _encode_fwd_impl(config: HashGridConfig, table, pos):
    scales, res, dense = _level_tables(config)

    def body(_, xs):
        tl, scale, r, isd = xs
        idx, w, _, _ = _level_geometry_dyn(config, scale, r, isd, pos)
        corner_feats = jnp.take(tl, idx, axis=0)  # (N, 2^D, F)
        return None, jnp.sum(corner_feats * w[..., None], axis=1)  # (N, F)

    _, feats = jax.lax.scan(body, None, (table, scales, res, dense))  # (L, N, F)
    L, N, F = feats.shape
    out = jnp.moveaxis(feats, 0, 1).reshape(N, L * F)
    return out, (table, pos)


def _encode_bwd_impl(config: HashGridConfig, residuals, g):
    table, pos = residuals
    g = g.astype(jnp.float32)
    L = config.n_levels
    F = config.n_features_per_level
    N = pos.shape[0]
    g_levels = jnp.moveaxis(g.reshape(N, L, F), 1, 0)  # (L, N, F)
    scales, res, dense = _level_tables(config)

    def body(d_pos, xs):
        tl, gl, scale, r, isd = xs
        idx, w, per_dim, offs = _level_geometry_dyn(config, scale, r, isd, pos)
        contrib = w[..., None] * gl[:, None, :]  # (N, 2^D, F)
        d_tl = jnp.zeros((config.table_size, F), jnp.float32)
        d_tl = d_tl.at[idx.reshape(-1)].add(contrib.reshape(-1, F))
        # position gradient
        corner_feats = jnp.take(tl, idx, axis=0)
        fdotg = jnp.sum(corner_feats * gl[:, None, :], axis=-1)  # (N, 2^D)
        sign = jnp.where(offs == 1, 1.0, -1.0)  # (2^D, D)
        for d in range(config.n_dims):
            others = [k for k in range(config.n_dims) if k != d]
            prod_others = (
                jnp.prod(per_dim[..., others], axis=-1) if others else jnp.ones_like(w)
            )
            dw = sign[None, :, d] * prod_others * scale
            d_pos = d_pos.at[:, d].add(jnp.sum(fdotg * dw, axis=-1))
        return d_pos, d_tl

    d_pos0 = jnp.zeros((N, pos.shape[1]), jnp.float32)
    d_pos, d_table = jax.lax.scan(body, d_pos0, (table, g_levels, scales, res, dense))
    return d_table, d_pos.astype(pos.dtype)


hashgrid_encode.defvjp(_encode_fwd_impl, _encode_bwd_impl)

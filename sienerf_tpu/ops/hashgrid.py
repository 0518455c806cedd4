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


def _level_indices(config: HashGridConfig, level: int, corner: jnp.ndarray) -> jnp.ndarray:
    """corner: (N, 2^D, D) uint32 grid coords -> (N, 2^D) table indices."""
    res = config.level_resolution(level)
    if config.level_is_dense(level):
        idx = corner[..., 0]
        stride = 1
        for d in range(1, config.n_dims):
            stride *= res
            idx = idx + corner[..., d] * jnp.uint32(stride)
    else:
        idx = corner[..., 0] * jnp.uint32(_PRIMES[0])
        for d in range(1, config.n_dims):
            idx = idx ^ (corner[..., d] * jnp.uint32(_PRIMES[d]))
    return (idx & jnp.uint32(config.table_size - 1)).astype(jnp.int32)


def _level_geometry(config: HashGridConfig, level: int, pos: jnp.ndarray):
    """Shared fwd/bwd geometry: indices, weights, and per-dim weight grads."""
    scale = config.level_scale(level)
    res = config.level_resolution(level)
    x = pos.astype(jnp.float32) * scale + 0.5
    x_floor = jnp.floor(x)
    frac = x - x_floor
    base = jnp.clip(x_floor, 0.0, res - 1).astype(jnp.uint32)  # (N, D)

    offs = jnp.asarray(_corner_offsets(config.n_dims))  # (2^D, D)
    corner = jnp.minimum(base[:, None, :] + offs[None, :, :], jnp.uint32(res - 1))
    idx = _level_indices(config, level, corner)  # (N, 2^D)

    # weights: prod_d (offs ? frac : 1-frac)
    f = frac[:, None, :]  # (N, 1, D)
    per_dim = jnp.where(offs[None, :, :] == 1, f, 1.0 - f)  # (N, 2^D, D)
    w = jnp.prod(per_dim, axis=-1)  # (N, 2^D)
    return idx, w, per_dim, offs, scale


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def hashgrid_encode(config: HashGridConfig, table: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Encode positions. table: (L, T, F) fp32; pos: (N, D) in [0,1]^D.

    Returns (N, L*F) float32 features (cast downstream as needed).
    """
    out, _ = _encode_fwd_impl(config, table, pos)
    return out


def _encode_fwd_impl(config: HashGridConfig, table, pos):
    feats = []
    for level in range(config.n_levels):
        idx, w, _, _, _ = _level_geometry(config, level, pos)
        tl = table[level]  # (T, F)
        corner_feats = jnp.take(tl, idx, axis=0)  # (N, 2^D, F)
        feats.append(jnp.sum(corner_feats * w[..., None], axis=1))  # (N, F)
    out = jnp.concatenate(feats, axis=-1)
    return out, (table, pos)


def _encode_bwd_impl(config: HashGridConfig, residuals, g):
    table, pos = residuals
    g = g.astype(jnp.float32)
    F = config.n_features_per_level
    d_table_levels = []
    d_pos = jnp.zeros_like(pos, dtype=jnp.float32)
    for level in range(config.n_levels):
        idx, w, per_dim, offs, scale = _level_geometry(config, level, pos)
        gl = g[:, level * F : (level + 1) * F]  # (N, F)
        # table gradient: scatter-add w * g at idx
        contrib = w[..., None] * gl[:, None, :]  # (N, 2^D, F)
        d_tl = jnp.zeros((config.table_size, F), jnp.float32)
        d_tl = d_tl.at[idx.reshape(-1)].add(contrib.reshape(-1, F))
        d_table_levels.append(d_tl)
        # position gradient: d w / d pos_d = scale * prod_{k!=d} per_dim_k * (+1 if corner bit else -1)
        corner_feats = jnp.take(table[level], idx, axis=0)  # (N, 2^D, F)
        fdotg = jnp.sum(corner_feats * gl[:, None, :], axis=-1)  # (N, 2^D)
        sign = jnp.where(offs[None, :, :] == 1, 1.0, -1.0)  # (1, 2^D, D)
        # prod over other dims = w_full / per_dim_d, computed stably via explicit product
        for d in range(config.n_dims):
            others = [k for k in range(config.n_dims) if k != d]
            if others:
                prod_others = jnp.prod(per_dim[..., others], axis=-1)  # (N, 2^D)
            else:
                prod_others = jnp.ones_like(w)
            dw_dpos = sign[..., d] * prod_others * scale
            d_pos = d_pos.at[:, d].add(jnp.sum(fdotg * dw_dpos, axis=-1))
    d_table = jnp.stack(d_table_levels, axis=0)
    return d_table, d_pos.astype(pos.dtype)


hashgrid_encode.defvjp(_encode_fwd_impl, _encode_bwd_impl)

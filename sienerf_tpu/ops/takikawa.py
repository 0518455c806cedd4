"""Takikawa (NGLOD) octree feature encoding.

Behavioral spec: reference takikawa_encoding.cuh:28-130 (`kernel_takikawa`):
traverse the triangle octree along the query position; at every visited
dual node with depth >= starting_level, trilinearly interpolate its 8
corner-vertex features with the position local to the node (optionally
smoothstep-warped); outputs concatenate per level (or sum when
`sum_instead_of_concat`).  Features init U(-1e-4, 1e-4)
(takikawa_encoding.cuh:429).  n_params = 8 * n_vertices (:432-433);
output dims = 8 * (octree_depth - starting_level) (:294).

TPU design: the pointer-chasing traversal becomes one `searchsorted` into
the level's sorted cell-code table per level — a found cell implies the
whole ancestor chain exists (children are only created under existing
parents), so levels are independent lookups and vectorize cleanly.
Gradients (feature scatter-add and the position gradient for analytic SDF
normals) come from autodiff through the gathers/lerp weights.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

N_FEATURES_PER_LEVEL = 8  # takikawa_encoding.cuh:272 template default


@dataclass(frozen=True)
class TakikawaConfig:
    depth: int  # octree depth (config n_levels)
    starting_level: int = 4
    sum_instead_of_concat: bool = False
    interpolation: str = "linear"  # or "smoothstep"

    @property
    def n_levels_out(self) -> int:
        return self.depth - self.starting_level

    @property
    def n_output_dims(self) -> int:
        if self.sum_instead_of_concat:
            return N_FEATURES_PER_LEVEL
        return N_FEATURES_PER_LEVEL * self.n_levels_out

    @staticmethod
    def from_network_config(enc: dict) -> "TakikawaConfig":
        return TakikawaConfig(
            depth=int(enc.get("n_levels", 8)),
            starting_level=int(enc.get("starting_level", 4)),
            sum_instead_of_concat=bool(enc.get("sum_instead_of_concat", False)),
            interpolation=str(enc.get("interpolation", "linear")).lower(),
        )


def init_takikawa_params(key, n_vertices: int, dtype=jnp.float32):
    return jax.random.uniform(
        key, (n_vertices, N_FEATURES_PER_LEVEL), dtype, minval=-1e-4, maxval=1e-4
    )


def takikawa_encode(
    config: TakikawaConfig, tables: dict, features: jnp.ndarray, pos: jnp.ndarray
) -> jnp.ndarray:
    """pos (N,3) in [0,1]^3 -> (N, n_output_dims).

    `tables` holds per-level {"codes_<d>": sorted int64, "verts_<d>":
    (n_d,8) int32} from geom.octree.octree_device_tables.
    """
    N = pos.shape[0]
    outs = []
    acc = jnp.zeros((N, N_FEATURES_PER_LEVEL), jnp.float32)
    for d in range(config.starting_level, config.depth):
        s = 1 << d
        x = pos * s
        cell_f = jnp.floor(jnp.clip(x, 0.0, s - 1e-4))
        local = x - cell_f
        # int32 packing is safe through depth 10 (see octree_device_tables)
        cell = cell_f.astype(jnp.int32)
        code = (cell[:, 0] * s + cell[:, 1]) * s + cell[:, 2]
        codes_d = tables[f"codes_{d}"]
        verts_d = tables[f"verts_{d}"]
        n_d = codes_d.shape[0]
        i = jnp.searchsorted(codes_d, code)
        i = jnp.clip(i, 0, max(n_d - 1, 0))
        found = (jnp.take(codes_d, i) == code) if n_d else jnp.zeros((N,), bool)
        vids = jnp.take(verts_d, i, axis=0) if n_d else jnp.zeros((N, 8), jnp.int32)

        if config.interpolation == "smoothstep":
            w_local = local * local * (3.0 - 2.0 * local)
        else:
            w_local = local
        # corner c weight: prod over dims of (w if bit set else 1-w);
        # corner bit order matches the octree child/corner convention
        offs = np.array([[(c >> dd) & 1 for dd in range(3)] for c in range(8)], np.float32)
        w = jnp.prod(
            jnp.where(offs[None, :, :] == 1.0, w_local[:, None, :], 1.0 - w_local[:, None, :]),
            axis=-1,
        )  # (N,8)
        cf = jnp.take(features, vids.reshape(-1), axis=0).reshape(N, 8, N_FEATURES_PER_LEVEL)
        lvl = jnp.sum(w[..., None] * cf, axis=1)
        lvl = jnp.where(found[:, None], lvl, 0.0)
        if config.sum_instead_of_concat:
            acc = acc + lvl
        else:
            outs.append(lvl)
    if config.sum_instead_of_concat:
        return acc
    return jnp.concatenate(outs, axis=-1)

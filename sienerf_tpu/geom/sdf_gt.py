"""Ground-truth signed distance from a triangle BVH.

Behavioral spec: reference triangle_bvh.cu:141-339 `signed_distance_gpu`
modes (common.h:104-109): Watertight (parity of a fixed stab ray),
Raystab (32 fibonacci-sphere stab rays — outside iff any ray escapes),
PathEscape (OptiX random walk — folded into Raystab here; no HW RT on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sienerf_tpu.common import MeshSdfMode
from sienerf_tpu.geom.bvh import bvh_closest_point, bvh_count_hits, bvh_raytrace
from sienerf_tpu.ops.samplers import fibonacci_sphere_dirs

_WATERTIGHT_DIR = np.asarray([0.48362, 0.62426, 0.61292], np.float32)  # fixed, irrational-ish
_N_STAB = 32


def unsigned_distance(bvh_dev: dict, points: jnp.ndarray):
    dist, tri_id, cp = bvh_closest_point(bvh_dev, points)
    return dist, tri_id, cp


def sign_watertight(bvh_dev: dict, points: jnp.ndarray) -> jnp.ndarray:
    """+1 outside / -1 inside by parity of one stab ray."""
    d = jnp.broadcast_to(jnp.asarray(_WATERTIGHT_DIR), points.shape)
    count = bvh_count_hits(bvh_dev, points, d)
    return jnp.where(count % 2 == 0, 1.0, -1.0)


def sign_raystab(bvh_dev: dict, points: jnp.ndarray, n_dirs: int = _N_STAB) -> jnp.ndarray:
    """+1 if any stab ray escapes without hitting the mesh."""
    dirs = fibonacci_sphere_dirs(n_dirs)
    N = points.shape[0]
    escaped = jnp.zeros((N,), bool)
    for i in range(n_dirs):
        d = jnp.broadcast_to(jnp.asarray(dirs[i]), points.shape)
        t, tid, _, _ = bvh_raytrace(bvh_dev, points, d)
        escaped = escaped | (tid < 0)
    return jnp.where(escaped, 1.0, -1.0)


def signed_distance(
    bvh_dev: dict, points: jnp.ndarray, mode: MeshSdfMode = MeshSdfMode.WATERTIGHT
) -> jnp.ndarray:
    dist, _, _ = unsigned_distance(bvh_dev, points)
    if mode == MeshSdfMode.WATERTIGHT:
        s = sign_watertight(bvh_dev, points)
    else:
        s = sign_raystab(bvh_dev, points)
    return dist * s

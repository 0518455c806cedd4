"""Ground-truth signed distance from a triangle BVH.

Behavioral spec: reference triangle_bvh.cu:141-339 `signed_distance_gpu`
modes (common.h:104-109): Watertight (parity of a fixed stab ray),
Raystab (32 fibonacci-sphere stab rays — outside iff any ray escapes),
PathEscape (src/optix/pathescape.cu: 32 random walks of 4 cosine bounces;
outside iff >2 walks escape — robust on open/leaky meshes where a single
straight stab ray through the opening misclassifies deep-interior points).
"""

from __future__ import annotations

import jax
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


def _cosine_dir(key, normal: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere sample around `normal` (N,3).

    Spec: random_dir_cosine + Onb inverse_transform
    (reference src/optix/pathescape.cu:29-54,105-107)."""
    u = jax.random.uniform(key, normal.shape[:-1] + (2,))
    phi = 2.0 * jnp.pi * u[..., 0]
    sz = jnp.sqrt(u[..., 1])  # cos(theta)
    sr = jnp.sqrt(jnp.maximum(1.0 - u[..., 1], 0.0))
    # Onb per the reference: binormal from the larger of |n.x|,|n.z|
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    use_x = jnp.abs(nx) > jnp.abs(nz)
    binormal = jnp.where(
        use_x[..., None],
        jnp.stack([-ny, nx, jnp.zeros_like(nx)], axis=-1),
        jnp.stack([jnp.zeros_like(nx), -nz, ny], axis=-1),
    )
    binormal = binormal / jnp.maximum(
        jnp.linalg.norm(binormal, axis=-1, keepdims=True), 1e-12)
    tangent = jnp.cross(binormal, normal)
    return (
        (sr * jnp.cos(phi))[..., None] * tangent
        + (sr * jnp.sin(phi))[..., None] * binormal
        + sz[..., None] * normal
    )


def sign_pathescape(
    bvh_dev: dict,
    points: jnp.ndarray,
    key=None,
    n_paths: int = 32,
    n_bounces: int = 4,
) -> jnp.ndarray:
    """+1 if more than 2 of `n_paths` random walks escape the mesh.

    Spec: __raygen__rg (reference src/optix/pathescape.cu:56-113): each
    walk starts in a uniform random direction; at a hit it restarts just
    short of the surface (t - 1e-3) in a cosine direction around the
    face-forward normal; a walk that misses has escaped. No HW-RT on TPU:
    each bounce is one batched stackless BVH traversal over all points
    (dead lanes masked) — 4x the raystab cost, GT-precompute only."""
    if key is None:
        key = jax.random.PRNGKey(0)
    N = points.shape[0]

    def one_path(carry, k):
        n_escaped = carry
        k_dir, k_b = jax.random.split(k)
        u = jax.random.uniform(k_dir, (N, 2))
        z = 2.0 * u[:, 0] - 1.0  # uniform sphere (reference random_dir)
        r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        phi = 2.0 * jnp.pi * u[:, 1]
        d0 = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)

        def bounce(j, st):
            origin, d, alive, escaped = st
            t, tid, _, _ = bvh_raytrace(bvh_dev, origin, d)
            miss = tid < 0
            escaped = escaped | (alive & miss)
            still = alive & ~miss
            safe = jnp.maximum(tid, 0)
            n0 = jnp.cross(bvh_dev["tri_ab"][safe], bvh_dev["tri_ac"][safe])
            n0 = n0 / jnp.maximum(jnp.linalg.norm(n0, axis=-1, keepdims=True), 1e-12)
            # faceforward: normal opposes the incoming direction
            n = jnp.where(jnp.sum(d * n0, -1, keepdims=True) > 0, -n0, n0)
            origin = jnp.where(
                still[:, None],
                origin + d * jnp.maximum(t - 1e-3, 0.0)[:, None],
                origin,
            )
            d_new = _cosine_dir(jax.random.fold_in(k_b, j), n)
            d = jnp.where(still[:, None], d_new, d)
            return origin, d, still, escaped

        _, _, _, escaped = jax.lax.fori_loop(
            0, n_bounces,
            bounce,
            (points, d0, jnp.ones((N,), bool), jnp.zeros((N,), bool)),
        )
        return n_escaped + escaped.astype(jnp.int32), None

    n_escaped, _ = jax.lax.scan(
        one_path, jnp.zeros((N,), jnp.int32), jax.random.split(key, n_paths)
    )
    return jnp.where(n_escaped > 2, 1.0, -1.0)


def signed_distance(
    bvh_dev: dict,
    points: jnp.ndarray,
    mode: MeshSdfMode = MeshSdfMode.WATERTIGHT,
    key=None,
) -> jnp.ndarray:
    dist, _, _ = unsigned_distance(bvh_dev, points)
    if mode == MeshSdfMode.WATERTIGHT:
        s = sign_watertight(bvh_dev, points)
    elif mode == MeshSdfMode.PATH_ESCAPE:
        s = sign_pathescape(bvh_dev, points, key)
    else:
        s = sign_raystab(bvh_dev, points)
    return dist * s

"""BVH build + traversal vs brute force (the reference's own oracle:
GT raytrace render mode, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sienerf_tpu.geom.bvh import build_bvh, bvh_any_hit, bvh_closest_point, bvh_raytrace
from sienerf_tpu.geom.mesh_io import load_obj, normalize_to_unit_cube, triangle_areas


def brute_force_trace(tri, o, d):
    """Reference all-triangles Möller–Trumbore in numpy."""
    a = tri[:, 0]
    ab = tri[:, 1] - tri[:, 0]
    ac = tri[:, 2] - tri[:, 0]
    best_t = np.full(len(o), np.inf)
    best_id = np.full(len(o), -1)
    for i in range(len(o)):
        pvec = np.cross(d[i], ac)
        det = np.sum(ab * pvec, axis=-1)
        ok = np.abs(det) > 1e-9
        inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0)
        tvec = o[i] - a
        u = np.sum(tvec * pvec, axis=-1) * inv
        qvec = np.cross(tvec, ab)
        v = np.sum(d[i] * qvec, axis=-1) * inv
        t = np.sum(ac * qvec, axis=-1) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-9)
        if hit.any():
            j = np.argmin(np.where(hit, t, np.inf))
            best_t[i] = t[j]
            best_id[i] = j
    return best_t, best_id


@pytest.fixture(scope="module")
def bunny():
    tri = load_obj("/root/reference/data/geometry/objs/bunny.obj")
    tri = normalize_to_unit_cube(tri)
    return tri


def test_bvh_build_structure(bunny):
    bvh = build_bvh(bunny)
    assert bvh.triangles.shape == bunny.shape
    assert bvh.n_nodes > 1
    # every triangle appears exactly once in leaf ranges
    covered = np.zeros(len(bunny), bool)
    for f, c in zip(bvh.first_tri, bvh.tri_count):
        if c > 0:
            assert not covered[f : f + c].any()
            covered[f : f + c] = True
    assert covered.all()
    # root bbox contains the mesh
    assert np.all(bvh.bbox_min[0] <= bunny.reshape(-1, 3).min(axis=0) + 1e-6)
    assert np.all(bvh.bbox_max[0] >= bunny.reshape(-1, 3).max(axis=0) - 1e-6)
    # skip links: monotone forward and terminating
    assert (bvh.skip > np.arange(bvh.n_nodes))[bvh.skip >= 0].all()


def test_bvh_raytrace_matches_brute_force(bunny):
    rng = np.random.default_rng(0)
    n = 64
    o = np.full((n, 3), 0.5) + rng.normal(0, 0.02, (n, 3))
    o[:, 2] = -0.5
    d = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = o.astype(np.float32)

    bt, bid = brute_force_trace(bunny, o, d)
    bvh = build_bvh(bunny)
    dev = bvh.as_device_arrays()
    t, tid, u, v = bvh_raytrace(dev, jnp.asarray(o), jnp.asarray(d))
    t = np.asarray(t)
    hit_ref = np.isfinite(bt)
    hit_bvh = np.isfinite(t)
    assert (hit_ref == hit_bvh).all()
    assert np.allclose(t[hit_bvh], bt[hit_ref], atol=1e-5)
    assert hit_ref.sum() > n // 3  # the test actually hits the bunny


def test_bvh_any_hit_shadow(bunny):
    bvh = build_bvh(bunny).as_device_arrays()
    o = jnp.asarray([[0.5, 0.5, -0.5], [0.5, 2.0, -0.5]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    occ = np.asarray(bvh_any_hit(bvh, o, d))
    assert occ[0] and not occ[1]


def test_bvh_closest_point_matches_brute_force(bunny):
    rng = np.random.default_rng(1)
    pts = (0.5 + rng.normal(0, 0.25, (32, 3))).astype(np.float32)
    bvh = build_bvh(bunny)
    dev = bvh.as_device_arrays()
    dist, tid, cp = bvh_closest_point(dev, jnp.asarray(pts))
    dist = np.asarray(dist)
    # brute force: distance to all triangle vertices is an upper bound; use
    # sampled points on triangles for a tight check
    verts = bunny.reshape(-1, 3)
    for i in range(len(pts)):
        d_vert = np.linalg.norm(verts - pts[i], axis=-1).min()
        assert dist[i] <= d_vert + 1e-5
        # closest point must lie near the mesh (within its own distance)
        assert abs(np.linalg.norm(np.asarray(cp[i]) - pts[i]) - dist[i]) < 1e-4


def test_bvh_cube_exact():
    tri = load_obj("/root/reference/data/geometry/objs/cube1.obj")
    tri = normalize_to_unit_cube(tri)
    bvh = build_bvh(tri).as_device_arrays()
    o = jnp.asarray([[0.5, 0.5, -1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, tid, _, _ = bvh_raytrace(bvh, o, d)
    # unit cube front face at z=0 -> t=1.0 from z=-1
    assert np.isclose(float(t[0]), 1.0, atol=1e-5)


def test_triangle_areas(bunny):
    areas = triangle_areas(bunny)
    assert (areas >= 0).all()
    assert areas.sum() > 0.1


def test_brute_raytrace_matches_bvh(bunny):
    """Dense tracer (geom/bvh.py brute tier) agrees with the BVH on hits,
    distances, and triangle ids (both index the reordered triangle array)."""
    from sienerf_tpu.geom.bvh import brute_raytrace, build_brute

    rng = np.random.default_rng(2)
    n = 257  # non-multiple of the ray tile: exercises padding
    o = np.full((n, 3), 0.5) + rng.normal(0, 0.05, (n, 3))
    o[:, 2] = -0.5
    d = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = o.astype(np.float32)

    bvh = build_bvh(bunny)
    dev = bvh.as_device_arrays()
    bt = build_brute(bvh.triangles)
    t0, id0, u0, v0 = bvh_raytrace(dev, jnp.asarray(o), jnp.asarray(d))
    t1, id1, u1, v1 = brute_raytrace(bt, jnp.asarray(o), jnp.asarray(d), ray_tile=128)
    t0, t1 = np.asarray(t0), np.asarray(t1)
    hit0, hit1 = np.isfinite(t0), np.isfinite(t1)
    assert (hit0 == hit1).all()
    assert hit0.sum() > n // 3
    assert np.allclose(t0[hit0], t1[hit1], atol=1e-4)
    # ids may legitimately differ where a ray grazes an edge shared by two
    # coplanar-adjacent tris at equal t; everywhere else they must agree
    same = id0 == id1
    assert same[hit0].mean() > 0.99
    assert np.allclose(np.asarray(u0)[same & hit0], np.asarray(u1)[same & hit1], atol=1e-3)


def test_brute_raytrace_t_max(bunny):
    from sienerf_tpu.geom.bvh import brute_raytrace, build_brute

    bvh = build_bvh(bunny)
    bt = build_brute(bvh.triangles)
    o = jnp.asarray([[0.5, 0.5, -0.5], [0.5, 0.5, -0.5]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    t, tid, _, _ = brute_raytrace(bt, o, d, t_max=jnp.asarray([10.0, 0.01]))
    assert np.isfinite(float(t[0])) and int(tid[0]) >= 0
    assert not np.isfinite(float(t[1])) and int(tid[1]) == -1

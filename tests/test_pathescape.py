"""PathEscape GT sign mode (reference src/optix/pathescape.cu).

VERDICT r2 missing #5: raystab folds were untested on open meshes, where
PathEscape is the point — a single straight stab ray escaping through a
hole misclassifies deep-interior points; the >2-of-32 multi-bounce walk
threshold is robust to small leaks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sienerf_tpu.common import MeshSdfMode
from sienerf_tpu.geom.bvh import build_bvh
from sienerf_tpu.geom.sdf_gt import (
    sign_pathescape,
    sign_raystab,
    sign_watertight,
    signed_distance,
)
from sienerf_tpu.ops.samplers import fibonacci_sphere_dirs


def _uv_sphere(n_theta=24, n_phi=48, hole_axis=None, hole_cos=None):
    """Unit UV sphere triangles; drop triangles whose centroid lies inside
    the cap around hole_axis (cos(angle) > hole_cos) to open a hole."""
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi + 1)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack(
        [np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)], axis=-1
    )
    tris = []
    for i in range(n_theta):
        for j in range(n_phi):
            a, b = pts[i, j], pts[i, j + 1]
            c, d = pts[i + 1, j], pts[i + 1, j + 1]
            if i > 0:
                tris.append([a, b, c])
            if i < n_theta - 1:
                tris.append([b, d, c])
    tris = np.asarray(tris, np.float32)
    if hole_axis is not None:
        cen = tris.mean(axis=1)
        cen /= np.linalg.norm(cen, axis=1, keepdims=True)
        keep = cen @ np.asarray(hole_axis, np.float32) < hole_cos
        tris = tris[keep]
    return tris


@pytest.fixture(scope="module")
def closed_sphere():
    return build_bvh(_uv_sphere()).as_device_arrays()


@pytest.fixture(scope="module")
def open_sphere():
    # hole aimed exactly at fibonacci stab dir #0 so raystab's straight
    # ray deterministically escapes from on-axis interior points
    axis = np.asarray(fibonacci_sphere_dirs(32)[0], np.float32)
    bvh = build_bvh(_uv_sphere(hole_axis=axis, hole_cos=np.cos(0.15)))
    return bvh.as_device_arrays(), axis


def test_pathescape_matches_watertight_on_closed_mesh(closed_sphere):
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-1.4, 1.4, (64, 3)).astype(np.float32))
    r = np.linalg.norm(np.asarray(pts), axis=1)
    keep = np.abs(r - 1.0) > 0.15  # stay off the surface shell
    s_pe = np.asarray(sign_pathescape(closed_sphere, pts, jax.random.PRNGKey(0)))
    s_wt = np.asarray(sign_watertight(closed_sphere, pts))
    assert (s_pe[keep] == s_wt[keep]).all()


def test_pathescape_robust_on_open_mesh(open_sphere):
    bvh, axis = open_sphere
    # deep-interior points on the hole axis (far side of the opening):
    # straight stab ray #0 exits through the cap from ANY on-axis point
    # (raystab says outside) but multi-bounce walks mostly die inside
    interior = jnp.asarray(
        np.stack([axis * t for t in (0.0, -0.4, -0.6)]).astype(np.float32)
    )
    s_rs = np.asarray(sign_raystab(bvh, interior))
    assert (s_rs > 0).all(), "test setup: raystab must misclassify these"
    s_pe = np.asarray(sign_pathescape(bvh, interior, jax.random.PRNGKey(1)))
    assert (s_pe < 0).all(), "pathescape must keep deep-interior points inside"
    # exterior points stay outside
    exterior = jnp.asarray(
        np.stack([axis * 1.6, -axis * 1.6, np.array([1.4, 0.9, 0.0])]).astype(np.float32)
    )
    s_out = np.asarray(sign_pathescape(bvh, exterior, jax.random.PRNGKey(2)))
    assert (s_out > 0).all()


def test_signed_distance_pathescape_mode(closed_sphere):
    pts = jnp.asarray(
        np.array([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [0.5, 0.0, 0.0]], np.float32)
    )
    sd = np.asarray(
        signed_distance(closed_sphere, pts, MeshSdfMode.PATH_ESCAPE, jax.random.PRNGKey(0))
    )
    assert sd[0] == pytest.approx(-1.0, abs=0.05)
    assert sd[1] == pytest.approx(0.5, abs=0.05)
    assert sd[2] == pytest.approx(-0.5, abs=0.05)

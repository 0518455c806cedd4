"""Mesh-optimization step (Testbed::optimise_mesh_step,
testbed_nerf.cu:3448-3500; compute_mesh_opt_gradients
marching_cubes.cu:708-766) and the 1-ring accumulator."""

import jax.numpy as jnp
import numpy as np

from sienerf_tpu.ops.meshing import extract_mesh, mesh_1ring, optimise_mesh


def test_mesh_1ring_triangle():
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    centroid, normals = mesh_1ring(verts, faces)
    centroid = np.asarray(centroid)
    normals = np.asarray(normals)
    # each vertex's 1-ring centroid = mean of the other two
    np.testing.assert_allclose(centroid[0], [0.5, 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(centroid[1], [0.0, 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(centroid[2], [0.5, 0.0, 0.0], atol=1e-6)
    # face normal (0,0,1) deposited at every corner
    for i in range(3):
        np.testing.assert_allclose(
            normals[i] / np.linalg.norm(normals[i]), [0, 0, 1], atol=1e-6
        )


def _ball_density(unit):
    # smooth radial density: high inside r<0.25, thresh 2.5 crossed near it
    r = jnp.linalg.norm(unit - 0.5, axis=-1)
    return 5.0 / (1.0 + jnp.exp((r - 0.25) * 40.0))


def test_optimise_mesh_converges_to_iso():
    amin = np.zeros(3, np.float32)
    adiag = np.ones(3, np.float32)
    verts, faces, _ = extract_mesh(_ball_density, 24, amin, adiag, iso=2.5)
    assert len(verts) > 50
    # perturb vertices off the surface
    rng = np.random.default_rng(0)
    noisy = verts + rng.normal(0, 0.02, verts.shape).astype(np.float32)

    def err(v):
        d = np.asarray(_ball_density(jnp.asarray((v - amin) / adiag)))
        return float(np.mean(np.abs(d - 2.5)))

    e_before = err(noisy)
    out = optimise_mesh(
        _ball_density, noisy, faces, amin, adiag, n_steps=100, thresh=2.5,
        learning_rate=1e-3,
    )
    e_after = err(out)
    assert np.isfinite(out).all()
    # vertices moved back toward the iso-surface
    assert e_after < 0.7 * e_before, (e_before, e_after)


def test_optimise_mesh_smoothing_pulls_to_centroid():
    # with only the smoothing term, a spiked vertex relaxes toward its ring
    verts = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0.5, 1, 0], [0.5, 0.4, 0.5]], np.float32
    )
    faces = np.asarray([[0, 1, 3], [1, 2, 3], [2, 0, 3]], np.int32)
    flat = lambda unit: jnp.zeros(unit.shape[:-1])  # no density signal

    out = optimise_mesh(
        flat, verts, faces, np.zeros(3, np.float32), np.ones(3, np.float32),
        n_steps=200, thresh=0.0, smooth_amount=1.0, density_amount=0.0,
        inflate_amount=0.0, learning_rate=1e-2,
    )
    # the spike's height above the base plane shrinks
    assert abs(out[3, 2]) < 0.6 * verts[3, 2]

"""Native C++ BVH builder vs numpy fallback equivalence."""

import numpy as np
import pytest


def test_native_build_matches_numpy_traversal():
    import jax.numpy as jnp

    from sienerf_tpu.geom import bvh_native
    from sienerf_tpu.geom.bvh import TriangleBVH, _build_bvh_numpy, bvh_raytrace
    from sienerf_tpu.geom.mesh_io import load_obj, normalize_to_unit_cube

    tri = normalize_to_unit_cube(load_obj("/root/reference/data/geometry/objs/bunny.obj"))
    try:
        built = bvh_native.build(tri)
    except Exception as e:
        pytest.skip(f"native builder unavailable: {e}")
    nat = TriangleBVH(*built)
    ref = _build_bvh_numpy(np.asarray(tri, np.float32), 4)
    # same triangle coverage
    assert sorted(nat.tri_index.tolist()) == sorted(ref.tri_index.tolist())
    rng = np.random.default_rng(0)
    o = np.full((64, 3), 0.5, np.float32)
    o[:, 2] = -0.5
    d = rng.normal(0, 0.25, (64, 3)).astype(np.float32)
    d[:, 2] = 1.0
    t1, i1, _, _ = bvh_raytrace(nat.as_device_arrays(), jnp.asarray(o), jnp.asarray(d))
    t2, i2, _, _ = bvh_raytrace(ref.as_device_arrays(), jnp.asarray(o), jnp.asarray(d))
    h1 = np.isfinite(np.asarray(t1))
    h2 = np.isfinite(np.asarray(t2))
    assert (h1 == h2).all()
    assert np.allclose(np.asarray(t1)[h1], np.asarray(t2)[h1], atol=1e-5)

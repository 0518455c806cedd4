"""Geometry (hybrid mesh+NeRF) mode + irradiance estimation tests."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

from sienerf_tpu.engines.geometry import GeometryEngine
from sienerf_tpu.engines import irradiance as irr
from sienerf_tpu.utils.camera import look_at_matrix


@pytest.fixture(scope="module")
def mesh_scene():
    eng = GeometryEngine.load_scene(
        "/root/reference/data/geometry/geometrypaths.json",
        data_root="/root/reference/data",
    )
    return eng


def test_scene_loads_three_bunnies(mesh_scene):
    assert len(mesh_scene.objects) == 3
    assert all(o.kind == "mesh" for o in mesh_scene.objects)
    assert mesh_scene.bvh_dev is not None
    # scene aabb covers the offset bunnies at centers (0,0,0),(1,1,1),(-1,1,1)
    assert mesh_scene.aabb.min[0] < -0.4
    assert mesh_scene.aabb.max[1] > 1.4


def test_mesh_frame_renders(mesh_scene):
    cam = look_at_matrix([0.5, 1.2, -2.5], [0.5, 0.8, 0.5])
    rgba, depth = mesh_scene.render_frame(48, 48, cam, (55.0, 55.0), tile=48 * 48)
    assert rgba.shape == (48, 48, 4)
    hit = np.isfinite(depth)
    assert 0.05 < hit.mean() < 0.9
    assert np.isfinite(rgba).all()
    # shading produces non-flat image on hits
    assert rgba[hit].std() > 0.01


@pytest.mark.slow
def test_hybrid_mesh_nerf_composition():
    from test_nerf_mode import make_dataset, tiny_config

    from sienerf_tpu.engines.nerf import NerfEngine

    ds = make_dataset()
    nerf_eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 13, grid_size=32, train_k=32)
    nerf_eng.train_march_iters = 96
    nerf_eng._phase = "fast"
    state = nerf_eng.init(0)
    key = jax.random.PRNGKey(0)
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, loss, _ = nerf_eng.train_bundle(state, sub)

    # scene: one cube mesh beside the NeRF ball
    import json, tempfile, pathlib

    scene = {
        "geometry": [
            {"center": [1.2, 0.0, 0.0], "path": "/root/reference/data/geometry/objs/cube1.obj", "type": "Mesh"},
            {"center": [0.0, 0.0, 0.0], "path": "inline", "type": "Nerf"},
        ]
    }
    with tempfile.TemporaryDirectory() as td:
        p = pathlib.Path(td) / "scene.json"
        # nerf path won't resolve on disk; bypass loader for the nerf entry
        scene_mesh_only = {"geometry": [scene["geometry"][0]]}
        p.write_text(json.dumps(scene_mesh_only))
        geo = GeometryEngine.load_scene(p)
    from sienerf_tpu.engines.geometry import GeometryObject

    cam = look_at_matrix([0.5, 0.5, -1.6], [0.7, 0.5, 0.5])
    # mesh-only pass first (the NeRF object is ignored before attachment)
    rgba_mesh, depth_mesh = geo.render_frame(64, 64, cam, (48.0, 48.0), tile=64 * 64)
    mesh_hit = np.isfinite(depth_mesh)

    geo.objects.append(
        GeometryObject("nerf", np.zeros(3, np.float32), "inline", nerf=nerf_eng, nerf_state=state)
    )
    rgba, depth = geo.render_frame(64, 64, cam, (48.0, 48.0), tile=64 * 64)
    assert np.isfinite(rgba).all()
    alpha = rgba[..., 3]
    assert alpha.max() > 0.5  # something rendered
    # NeRF ball must add alpha where the mesh (offset at x=+1.2) is absent
    nerf_region = (alpha > 0.5) & ~mesh_hit
    assert nerf_region.sum() > 10
    # and hybrid depth must be finite on solid NeRF pixels (depth overwrite)
    assert np.isfinite(depth[nerf_region]).sum() > 5
    # baked-renderer hybrid path: same composition through the feature grid
    rgba_b, depth_b = geo.render_frame(
        64, 64, cam, (48.0, 48.0), tile=64 * 64, renderer="baked"
    )
    assert np.isfinite(rgba_b).all()
    nerf_region_b = (rgba_b[..., 3] > 0.5) & ~mesh_hit
    assert nerf_region_b.sum() > 10
    # the two renderers agree on coverage (lattice-quantized field)
    agree = np.mean((rgba[..., 3] > 0.5) == (rgba_b[..., 3] > 0.5))
    assert agree > 0.9, agree


def test_irradiance_constant_envmap_identity():
    H, W = 16, 32
    L = jnp.asarray([0.8, 0.5, 0.2])
    env = jnp.concatenate([jnp.broadcast_to(L, (H, W, 3)), jnp.ones((H, W, 1))], axis=-1)
    E = irr.irradiance_from_envmap(env)
    # constant radiance -> irradiance == radiance for every normal
    assert np.allclose(np.asarray(E), np.asarray(L), atol=0.05)
    # SH route agrees
    coeffs = irr.sh_project_envmap(env)
    normals = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    E_sh = irr.sh_irradiance(jnp.broadcast_to(coeffs, (64, 9, 3)), normals)
    assert np.allclose(np.asarray(E_sh), np.asarray(L), atol=0.05)


def test_irradiance_directional_envmap():
    """Envmap bright only in the +y hemisphere: normals facing +y receive
    more irradiance than normals facing -y."""
    H, W = 16, 32
    dirs = irr._latlong_dirs(W, H).reshape(H, W, 3)
    bright = (dirs[..., 1] > 0).astype(jnp.float32)
    env = jnp.concatenate([jnp.broadcast_to(bright[..., None], (H, W, 3)), jnp.ones((H, W, 1))], axis=-1)
    E = irr.irradiance_from_envmap(env)
    up_uv = irr.dir_to_latlong_uv(jnp.asarray([[0.0, 1.0, 0.0]]))
    down_uv = irr.dir_to_latlong_uv(jnp.asarray([[0.0, -1.0, 0.0]]))
    e_up = irr.sample_envmap_irradiance(E, jnp.asarray([[0.0, 1.0, 0.0]]))
    e_down = irr.sample_envmap_irradiance(E, jnp.asarray([[0.0, -1.0, 0.0]]))
    assert float(e_up[0, 0]) > 3 * float(e_down[0, 0])


@pytest.mark.slow
def test_probe_grid_on_trained_nerf():
    from test_nerf_mode import make_dataset, tiny_config

    from sienerf_tpu.engines.nerf import NerfEngine

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 12, grid_size=32, train_k=24)
    eng.train_march_iters = 64
    eng._phase = "fast"
    state = eng.init(0)
    key = jax.random.PRNGKey(1)
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, _, _ = eng.train_bundle(state, sub)
    grid = irr.bake_probe_grid(eng, state, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0], grid_size=2, env_width=16, env_height=8)
    assert grid["coeffs"].shape == (2, 2, 2, 9, 3)
    assert np.isfinite(np.asarray(grid["coeffs"])).all()
    pos = jax.random.uniform(jax.random.PRNGKey(2), (16, 3))
    n = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    E = irr.sample_probe_grid(grid, pos, n)
    assert E.shape == (16, 3)
    assert np.isfinite(np.asarray(E)).all()
    assert (np.asarray(E) >= 0).all()


def test_hybrid_sweep_renderer_depth_stop():
    """renderer="sweep" hybrid (VERDICT r4 #2): the NeRF half rides the
    slab-sweep with a per-pixel mesh-depth stop.  Properties: (a) pixels
    covered by an opaque mesh IN FRONT of the NeRF show exactly the mesh
    (the t_stop clamp kills every NeRF sample behind it), (b) the NeRF
    still renders off-mesh, (c) coverage agrees with the gather-hybrid
    (renderer="baked") on the same scene."""
    from test_nerf_mode import make_dataset, tiny_config

    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.engines.geometry import GeometryObject

    ds = make_dataset()
    nerf_eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 13,
                                 grid_size=32, train_k=32)
    nerf_eng.train_march_iters = 96
    nerf_eng._phase = "fast"
    state = nerf_eng.init(0)
    key = jax.random.PRNGKey(0)
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, loss, _ = nerf_eng.train_bundle(state, sub)

    import json, tempfile, pathlib

    # cube BETWEEN the camera and the NeRF ball: it must occlude
    scene_mesh_only = {"geometry": [
        {"center": [0.55, 0.5, -0.4],
         "path": "/root/reference/data/geometry/objs/cube1.obj",
         "type": "Mesh"},
    ]}
    with tempfile.TemporaryDirectory() as td:
        p = pathlib.Path(td) / "scene.json"
        p.write_text(json.dumps(scene_mesh_only))
        geo = GeometryEngine.load_scene(p)

    cam = look_at_matrix([0.5, 0.5, -1.6], [0.5, 0.5, 0.5])
    rgba_mesh, depth_mesh = geo.render_frame(64, 64, cam, (48.0, 48.0),
                                             tile=64 * 64)
    mesh_hit = np.isfinite(depth_mesh)
    assert mesh_hit.sum() > 50  # the cube really covers pixels

    geo.objects.append(GeometryObject(
        "nerf", np.zeros(3, np.float32), "inline",
        nerf=nerf_eng, nerf_state=state))
    rgba_s, depth_s = geo.render_frame(64, 64, cam, (48.0, 48.0),
                                       tile=64 * 64, renderer="sweep")
    assert np.isfinite(rgba_s).all()
    # (a) occluded pixels: the mesh color (t_stop kills every NeRF sample
    # behind the surface; what remains is legitimate in-front fog of the
    # under-trained field + e-grid edge interpolation, both tiny)
    d = np.abs(rgba_s[mesh_hit] - rgba_mesh[mesh_hit])
    assert d.max() < 0.05, d.max()
    assert (d < 1e-3).mean() > 0.98, (d < 1e-3).mean()
    # (b) the ball renders off-mesh
    nerf_region = (rgba_s[..., 3] > 0.5) & ~mesh_hit
    assert nerf_region.sum() > 10
    # (c) coverage agreement with the gather hybrid
    rgba_b, _ = geo.render_frame(64, 64, cam, (48.0, 48.0), tile=64 * 64,
                                 renderer="baked")
    agree = np.mean((rgba_s[..., 3] > 0.5) == (rgba_b[..., 3] > 0.5))
    assert agree > 0.85, agree

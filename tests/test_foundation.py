"""Foundation-layer tests: config merge, bbox, camera rays, tonemap, samplers."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from sienerf_tpu.common import LensMode
from sienerf_tpu.ops import samplers
from sienerf_tpu.ops.tonemap import linear_to_srgb, srgb_to_linear
from sienerf_tpu.utils.bbox import BoundingBox
from sienerf_tpu.utils.camera import (
    Lens,
    focal_length_to_fov,
    fov_to_focal_length,
    iterative_opencv_lens_undistortion,
    look_at_matrix,
    opencv_lens_distortion_delta,
    pixel_grid_uv,
    uv_to_ray,
)
from sienerf_tpu.utils.config import deep_merge, load_network_config, loads_jsonc


def test_jsonc_and_parent_merge(tmp_path):
    (tmp_path / "parent.json").write_text(json.dumps({"a": 1, "nested": {"x": 1, "y": 2}}))
    (tmp_path / "child.json").write_text('{\n// comment\n"parent": "parent.json", "nested": {"y": 3}, "b": "s//not-comment"}')
    cfg = load_network_config(tmp_path / "child.json")
    assert cfg == {"a": 1, "nested": {"x": 1, "y": 3}, "b": "s//not-comment"}


def test_jsonc_strings_with_slashes():
    assert loads_jsonc('{"p": "a//b" // trailing\n}') == {"p": "a//b"}


def test_deep_merge_child_wins():
    assert deep_merge({"a": {"b": 1, "c": 2}}, {"a": {"b": 9}}) == {"a": {"b": 9, "c": 2}}


def test_reference_configs_load():
    import pathlib

    ref = pathlib.Path("/root/reference/configs")
    if not ref.exists():
        pytest.skip("no reference configs")
    for p in ref.rglob("*.json"):
        cfg = load_network_config(p)
        assert "encoding" in cfg or "network" in cfg or isinstance(cfg, dict)


def test_bbox_ray_intersect():
    box = BoundingBox.from_scale(1.0)  # [0,1]^3
    o = jnp.array([[0.5, 0.5, -1.0], [2.0, 2.0, 2.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    tmin, tmax = box.ray_intersect(o, d)
    assert np.isclose(tmin[0], 1.0) and np.isclose(tmax[0], 2.0)
    assert tmin[1] > tmax[1]  # miss


def test_bbox_contains_relpos():
    box = BoundingBox.from_scale(4.0)
    assert bool(box.contains(jnp.array([0.5, 0.5, 0.5])))
    assert not bool(box.contains(jnp.array([3.0, 0.0, 0.0])))
    rel = box.relative_pos(jnp.array(box.min))
    assert np.allclose(rel, 0.0)


def test_fov_focal_roundtrip():
    f = fov_to_focal_length(1080, 50.0)
    assert np.isclose(focal_length_to_fov(1080, f), 50.0)


def test_pinhole_ray_geometry():
    cam = look_at_matrix([0, 0, -2], [0, 0, 0])
    uv = jnp.array([[0.5, 0.5]])
    o, d = uv_to_ray(uv, (100, 100), (100.0, 100.0), cam)
    assert np.allclose(o[0], [0, 0, -2], atol=1e-6)
    d0 = np.asarray(d[0] / np.linalg.norm(d[0]))
    assert np.allclose(d0, [0, 0, 1], atol=1e-6)
    # off-center pixel deviates in the right direction (u>0.5 -> +x in cam frame)
    o2, d2 = uv_to_ray(jnp.array([[0.75, 0.5]]), (100, 100), (100.0, 100.0), cam)
    assert d2[0, 0] * np.dot(cam[:, 0], [1, 0, 0]) > 0


def test_opencv_undistortion_inverts_distortion():
    params = (0.0578421, -0.0805099, -0.000980296, 0.00015575)  # fox lens
    x = jnp.linspace(-0.3, 0.3, 7)
    y = jnp.linspace(-0.2, 0.2, 7)
    xx, yy = jnp.meshgrid(x, y)
    xu, yu = iterative_opencv_lens_undistortion(params, xx, yy)
    du, dv = opencv_lens_distortion_delta(params, xu, yu)
    assert np.allclose(xu + du, xx, atol=1e-5)
    assert np.allclose(yu + dv, yy, atol=1e-5)


def test_pixel_grid_uv_centers():
    uv = pixel_grid_uv(4, 2)
    assert uv.shape == (2, 4, 2)
    assert np.isclose(uv[0, 0, 0], 0.5 / 4)
    assert np.isclose(uv[1, 3, 1], 1.5 / 2)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    assert np.allclose(srgb_to_linear(linear_to_srgb(x)), x, atol=1e-5)


def test_halton_low_discrepancy():
    pts = np.asarray(samplers.halton_2d(jnp.arange(256)))
    assert pts.shape == (256, 2)
    assert pts.min() >= 0 and pts.max() < 1
    # mean of a LD sequence approaches 0.5 fast
    assert np.allclose(pts.mean(axis=0), 0.5, atol=0.02)


def test_sobol_low_discrepancy():
    pts = np.asarray(samplers.sobol_2d(jnp.arange(256)))
    assert np.allclose(pts.mean(axis=0), 0.5, atol=0.02)
    # dim0 is the base-2 radical inverse: 0, .5, .25, .75
    assert np.allclose(pts[:4, 0], [0.0, 0.5, 0.25, 0.75])


def test_fibonacci_dirs_unit():
    d = samplers.fibonacci_sphere_dirs(32)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 0.1


def test_latlong_roundtrip():
    from sienerf_tpu.utils.camera import dir_to_latlong_uv, latlong_to_dir

    u = jnp.linspace(0.05, 0.95, 8)
    v = jnp.linspace(0.05, 0.95, 8)
    uu, vv = jnp.meshgrid(u, v)
    d = latlong_to_dir(uu, vv)
    uv2 = dir_to_latlong_uv(d)
    assert np.allclose(uv2[..., 0], uu, atol=1e-5)
    assert np.allclose(uv2[..., 1], vv, atol=1e-5)


def test_hsv_flow_helpers():
    """hsv_to_rgb matches the reference switch table (common_device.cuh:714);
    flow_to_rgb maps +x to hue 0.5 (cyan-ish) with value = |flow|."""
    import jax.numpy as jnp

    from sienerf_tpu.ops.tonemap import flow_to_rgb, hsv_to_rgb

    h = jnp.asarray([0.0, 1 / 6, 2 / 6, 3 / 6, 4 / 6, 5 / 6])
    one = jnp.ones_like(h)
    rgb = np.asarray(hsv_to_rgb(h, one, one))
    exp = np.asarray(
        [[1, 0, 0], [1, 1, 0], [0, 1, 0], [0, 1, 1], [0, 0, 1], [1, 0, 1]],
        np.float32,
    )
    assert np.allclose(rgb, exp, atol=1e-5), rgb
    # s == 0 -> gray
    g = np.asarray(hsv_to_rgb(jnp.asarray([0.3]), jnp.asarray([0.0]), jnp.asarray([0.7])))
    assert np.allclose(g, 0.7)
    f = np.asarray(flow_to_rgb(jnp.asarray([[0.5, 0.0], [0.0, 0.0]])))
    assert np.allclose(np.linalg.norm(f[0]), 0.5 * np.linalg.norm([0, 1, 1]), atol=1e-5)
    assert np.allclose(f[1], 0.0)

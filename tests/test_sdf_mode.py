"""SDF mode: GT signed distance correctness on an analytic cube, short
training run (IoU harness = the reference's oracle), sphere tracer vs GT
raytrace."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sienerf_tpu.common import MeshSdfMode
from sienerf_tpu.engines.sdf import SdfEngine
from sienerf_tpu.geom.bvh import build_bvh
from sienerf_tpu.geom.mesh_io import load_obj, normalize_to_unit_cube
from sienerf_tpu.geom.sdf_gt import signed_distance
from sienerf_tpu.utils.camera import look_at_matrix


def cube_mesh(lo=0.3, hi=0.7):
    """Axis-aligned cube as 12 triangles."""
    v = np.array(
        [[x, y, z] for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)], np.float32
    )
    faces = [
        (0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),  # x faces
        (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),  # y faces
        (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),  # z faces
    ]
    return v[np.asarray(faces)]


def analytic_cube_sdf(p, lo=0.3, hi=0.7):
    center, half = (lo + hi) / 2, (hi - lo) / 2
    q = np.abs(p - center) - half
    outside = np.linalg.norm(np.maximum(q, 0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0)
    return outside + inside


@pytest.mark.slow
def test_signed_distance_matches_analytic_cube():
    tri = cube_mesh()
    bvh = build_bvh(tri).as_device_arrays()
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.95, (256, 3)).astype(np.float32)
    for mode in (MeshSdfMode.WATERTIGHT, MeshSdfMode.RAYSTAB):
        sd = np.asarray(signed_distance(bvh, jnp.asarray(pts), mode))
        gt = analytic_cube_sdf(pts)
        assert np.allclose(sd, gt, atol=2e-3), (mode, np.abs(sd - gt).max())


def small_config():
    return {
        "loss": {"otype": "MAPE"},
        "optimizer": {
            "otype": "Ema",
            "decay": 0.95,
            "nested": {
                "otype": "ExponentialDecay",
                "decay_start": 10000,
                "decay_interval": 5000,
                "decay_base": 0.33,
                "nested": {"otype": "Adam", "learning_rate": 1e-3, "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
            },
        },
        "encoding": {"otype": "HashGrid", "n_levels": 8, "n_features_per_level": 2, "log2_hashmap_size": 15, "base_resolution": 16},
        "network": {"n_neurons": 32, "n_hidden_layers": 2},
    }


@pytest.fixture(scope="module")
def trained_bunny():
    tri = load_obj("/root/reference/data/geometry/objs/bunny.obj")
    tri = normalize_to_unit_cube(tri, scale_margin=0.8)
    eng = SdfEngine.create(small_config(), tri, batch_size=1 << 13)
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, loss = eng.train_bundle(state, sub)
        losses.append(float(loss))
    return eng, state, losses


def test_sdf_training_converges(trained_bunny):
    eng, state, losses = trained_bunny
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses


def test_sdf_iou(trained_bunny):
    eng, state, losses = trained_bunny
    iou = eng.calculate_iou(state, resolution=32, n_chunks=4)
    assert iou > 0.6, iou


def test_sphere_trace_vs_gt_render(trained_bunny):
    eng, state, losses = trained_bunny
    from sienerf_tpu.ops.optim import inference_params

    cam = look_at_matrix([0.5, 0.6, -0.8], [0.5, 0.5, 0.5])
    params = inference_params(state["opt"], state["params"])
    res = 48
    gt_img, gt_depth = eng.render_frame(params, None, res, res, cam, ground_truth=True)
    nn_img, nn_depth = eng.render_frame(params, None, res, res, cam, ground_truth=False)
    gt_hit = np.isfinite(np.asarray(gt_depth))
    nn_hit = np.isfinite(np.asarray(nn_depth))
    assert gt_hit.mean() > 0.1  # bunny occupies part of the frame
    # silhouettes agree reasonably after a short training run
    agree = (gt_hit == nn_hit).mean()
    assert agree > 0.85, agree
    # depths agree where both hit
    both = gt_hit & nn_hit
    if both.any():
        err = np.abs(np.asarray(gt_depth)[both] - np.asarray(nn_depth)[both])
        assert np.median(err) < 0.05, np.median(err)


def test_gt_render_modes_run(trained_bunny):
    eng, state, losses = trained_bunny
    cam = look_at_matrix([0.5, 0.5, -0.9], [0.5, 0.5, 0.5])
    for mode in ("shade", "normals", "ao", "positions", "depth"):
        img, _ = eng.render_frame(state["params"], None, 16, 16, cam, ground_truth=True, render_mode=mode)
        assert np.isfinite(np.asarray(img)).all(), mode


def test_slice_render_mode(trained_bunny):
    """Slice plane (testbed_sdf.cu:891-975): SDF values on the camera-facing
    plane, negative (inside) in red / positive (outside) in green."""
    eng, state, losses = trained_bunny
    cam = look_at_matrix([0.5, 0.5, -0.9], [0.5, 0.5, 0.5])
    img, depth = eng.render_frame(
        state["params"], None, 24, 24, cam, render_mode="slice",
        background=(0.0, 0.0, 0.0),
    )
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img[..., 2].max() == 0.0  # blue channel unused
    assert img[..., 0].max() > 0.0  # some inside (negative sdf)
    assert img[..., 1].max() > 0.0  # some outside (positive sdf)
    # explicit plane depth variant parses and runs
    img2, _ = eng.render_frame(
        state["params"], None, 8, 8, cam, render_mode="slice:1.4"
    )
    assert np.isfinite(np.asarray(img2)).all()


def test_fd_normals_match_analytic():
    """6-tap finite-difference normals (reference
    FiniteDifferenceNormalsApproximator) match autodiff normals on a smooth
    field.  Uses a frequency-encoded network: analytic and FD gradients of a
    smooth function must agree, which validates the tap layout/sign
    conventions independent of hash-grid cell noise."""
    cfg = dict(small_config())
    cfg["encoding"] = {"otype": "Frequency", "n_frequencies": 4}
    tri = cube_mesh()
    eng = SdfEngine.create(cfg, tri, batch_size=1 << 10)
    state = eng.init(0)
    params = state["params"]
    pos = jax.random.uniform(jax.random.PRNGKey(7), (256, 3), minval=0.2, maxval=0.8)
    na = np.asarray(eng._normals(params, pos))
    nf = np.asarray(eng._normals_fd(params, pos, eps=1e-4))
    assert np.allclose(np.linalg.norm(nf, axis=-1), 1.0, atol=1e-3)
    cos = np.sum(na * nf, axis=-1)
    # analytic normals differentiate the bf16 forward, FD taps run fp32 —
    # agreement is near-exact except where bf16 rounding perturbs autodiff
    assert np.median(cos) > 0.999, np.median(cos)
    assert np.min(cos) > 0.95, np.min(cos)

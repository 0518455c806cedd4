"""Per-image extra-dim conditioning: learnable latent appearance codes
(reference reset_extra_dims testbed_nerf.cu:3680-3700, gradient kernel
compute_extra_dims_gradient_train_nerf :1323-1359) and fixed light-dir
conditioning (nerf_loader.cu:667-676, nerf_loader.h:85-87)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sienerf_tpu.io.nerf_dataset import NerfDataset
from sienerf_tpu.utils.camera import look_at_matrix

RES = 16
N_VIEWS = 4


def tiny_config():
    return {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15},
        "encoding": {
            "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
            "log2_hashmap_size": 12, "base_resolution": 8,
        },
        "network": {"n_neurons": 16, "n_hidden_layers": 1},
        "dir_encoding": {
            "otype": "Composite",
            "nested": [
                {"n_dims_to_encode": 3, "otype": "SphericalHarmonics", "degree": 2},
                {"otype": "Identity"},
            ],
        },
        "rgb_network": {"n_neurons": 16, "n_hidden_layers": 1},
    }


def make_dataset(n_extra=0, light_dirs=None):
    rng = np.random.default_rng(3)
    images = rng.uniform(0.2, 0.8, (N_VIEWS, RES, RES, 4)).astype(np.float32)
    images[..., 3] = 1.0
    xforms = []
    for i in range(N_VIEWS):
        ang = 2 * np.pi * i / N_VIEWS
        eye = [0.5 + np.cos(ang), 0.6, 0.5 + np.sin(ang)]
        xforms.append(look_at_matrix(eye, [0.5, 0.5, 0.5]))
    return NerfDataset(
        images=images,
        xforms=np.stack(xforms).astype(np.float32),
        focal_lengths=np.full((N_VIEWS, 2), RES * 1.2, np.float32),
        principal_points=np.full((N_VIEWS, 2), 0.5, np.float32),
        resolution=(RES, RES),
        aabb_scale=1.0,
        n_extra_learnable_dims=n_extra,
        light_dirs=light_dirs,
    )


def make_engine(ds):
    from sienerf_tpu.engines.nerf import NerfEngine

    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 10,
                            grid_size=32, train_k=16)
    eng.train_march_iters = 32
    eng.use_error_map = False
    return eng


@pytest.mark.slow
def test_latent_codes_created_and_trained():
    ds = make_dataset(n_extra=2)
    assert ds.n_extra_dims == 2
    eng = make_engine(ds)
    assert eng.net.n_extra_dims == 2
    assert eng.optimize_extra_dims
    state = eng.init(0)
    ex0 = np.asarray(state["params"]["extra_dims"])
    assert ex0.shape == (N_VIEWS, 2)
    # random U[-1,1] init (reset_extra_dims)
    assert np.abs(ex0).max() <= 1.0
    assert not np.allclose(ex0, 0.0)
    state, loss, _ = eng.train_bundle(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    ex1 = np.asarray(state["params"]["extra_dims"])
    # learnable codes move under training
    assert not np.allclose(ex0, ex1)


def test_light_dirs_fixed_conditioning():
    ld = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (N_VIEWS, 1))
    ds = make_dataset(light_dirs=ld)
    assert ds.n_extra_dims == 3
    eng = make_engine(ds)
    assert eng.net.n_extra_dims == 3
    assert not eng.optimize_extra_dims
    state = eng.init(0)
    ex0 = np.asarray(state["params"]["extra_dims"])
    # first 3 dims = warp_direction(light_dir) = (d+1)/2
    np.testing.assert_allclose(ex0, (ld + 1.0) * 0.5, atol=1e-6)
    state, loss, _ = eng.train_bundle(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # fixed conditioning: rows never move
    np.testing.assert_allclose(
        np.asarray(state["params"]["extra_dims"]), ex0, atol=1e-7
    )


def test_render_rays_with_extra_row():
    ds = make_dataset(n_extra=2)
    eng = make_engine(ds)
    state = eng.init(0)
    params, bitfield = state["params"], state["occ"]["bitfield"]
    o = np.full((8, 3), 0.1, np.float32)
    d = np.tile(np.asarray([[1.0, 0.6, 0.8]], np.float32), (8, 1))
    # default path (view 0's code) and an explicit row both run
    rgb0, op0, dep0 = eng.render_rays(params, bitfield, o, d)
    row = params["extra_dims"][1]
    rgb1, op1, dep1 = eng.render_rays(params, bitfield, o, d, extra_row=row)
    assert np.isfinite(np.asarray(rgb0)).all()
    assert np.isfinite(np.asarray(rgb1)).all()


def test_loader_parses_driver_parameters(tmp_path):
    img = np.zeros((8, 8, 3), np.uint8)
    import cv2

    cv2.imwrite(str(tmp_path / "f0.png"), img)
    cv2.imwrite(str(tmp_path / "f1.png"), img)
    meta = {
        "camera_angle_x": 0.9,
        "n_extra_learnable_dims": 4,  # overridden to 0 by light dirs
        "frames": [
            {
                "file_path": "f0",
                "transform_matrix": np.eye(4).tolist(),
                "driver_parameters": {"LightX": 1.0, "LightY": 0.0, "LightZ": 0.0},
            },
            {
                "file_path": "f1",
                "transform_matrix": np.eye(4).tolist(),
                "driver_parameters": {"LightX": 0.0, "LightY": 1.0, "LightZ": 0.0},
            },
        ],
    }
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset

    ds = load_nerf_dataset(tmp_path)
    assert ds.light_dirs is not None
    assert ds.n_extra_learnable_dims == 0  # nerf_loader.cu:675-676
    assert ds.n_extra_dims == 3
    # nerf->ngp axis cycle xyz -> yzx
    np.testing.assert_allclose(ds.light_dirs[0], [0.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(ds.light_dirs[1], [1.0, 0.0, 0.0], atol=1e-6)

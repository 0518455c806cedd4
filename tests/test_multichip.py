"""Multi-chip ray sharding over a virtual 8-device CPU mesh: the sharded
train bundle and sharded renderer must run and agree qualitatively with the
single-chip path (SURVEY.md §2.9: the one genuinely distributed component)."""

import jax
import numpy as np
import pytest

from sienerf_tpu.parallel.mesh import make_ray_mesh, replicate


@pytest.fixture(scope="module")
def setup():
    import sys

    sys.path.insert(0, "tests")
    from test_nerf_mode import make_dataset, tiny_config

    from sienerf_tpu.engines.nerf import NerfEngine

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 13, grid_size=32, train_k=32)
    eng.train_march_iters = 96
    eng._phase = "fast"
    return eng, ds


def test_device_count():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual CPU devices"


@pytest.mark.slow
def test_sharded_train_bundle_runs_and_learns(setup):
    eng, ds = setup
    mesh = make_ray_mesh(8)
    state = replicate(eng.init(0), mesh)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        key, sub = jax.random.split(key)
        state, loss, cnt = eng.train_bundle_multichip(state, sub, mesh)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses


def test_sharded_step_equals_mean_of_per_shard_grads(setup):
    """NUMERICAL equivalence of the data-parallel train step (VERDICT r2
    next #7): one optimizer step under shard_map (rays sharded, grads
    pmean'd) must produce the same params, loss, emap, and counts as a
    single-device step taking the mean of the 8 per-shard gradients —
    the exact contract of SURVEY §2.9's DP mapping.  (Bundle-level equality
    does not hold BY DESIGN: the occupancy update unions per-chip sample
    sets; the step is where grads must agree.)"""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from sienerf_tpu.ops.importance import splat_errors
    from sienerf_tpu.ops.optim import optim_step
    from sienerf_tpu.models.nerf_network import nerf_l2_mask

    eng, ds = setup
    mesh = make_ray_mesh(8)
    state = eng.init(0)
    key = jax.random.PRNGKey(2)
    for _ in range(2):  # make the field non-trivial first
        key, sub = jax.random.split(key)
        state, _, _ = eng.train_bundle(state, sub)
    n_rays, k, iters = eng._phase_geometry()
    n_local = 256
    step_key = jax.random.PRNGKey(7)

    def inner(st, kk, data):
        return eng._train_one_step(st, data, kk, n_local, "rays", k, iters)

    st_sh, loss_sh, cnt_sh = shard_map(
        inner, mesh=mesh, in_specs=(P(), P(), P()), out_specs=(P(), P(), P()),
        check_vma=False,
    )(replicate(state, mesh), step_key, eng.data)

    # reference: the 8 per-shard grads on ONE device, averaged by hand
    def loss_of(p, kk):
        return eng._loss_for_batch(
            p, state["occ"]["bitfield"], eng.data, kk, n_local,
            state.get("emap"), state["step"], k, iters,
        )

    grads_acc, losses, cnts = None, [], []
    metas, per_rays = [], []
    for i in range(8):
        kk = jax.random.fold_in(step_key, i)
        (loss_i, (counts_i, per_ray_i, meta_i)), g_i = jax.value_and_grad(
            loss_of, has_aux=True
        )(state["params"], kk)
        losses.append(float(loss_i))
        cnts.append(float(jnp.mean(counts_i.astype(jnp.float32))))
        metas.append(meta_i)
        per_rays.append(per_ray_i)
        grads_acc = g_i if grads_acc is None else jax.tree.map(
            jnp.add, grads_acc, g_i
        )
    grads_mean = jax.tree.map(lambda x: x / 8.0, grads_acc)
    params_ref, _ = optim_step(
        eng.opt, state["opt"], state["params"], grads_mean,
        nerf_l2_mask(state["params"]), None,
    )
    ref = jax.tree.leaves(params_ref)
    got = jax.tree.leaves(st_sh["params"])
    assert len(ref) == len(got) and len(ref) > 0
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=1e-6
        )
    np.testing.assert_allclose(float(loss_sh), np.mean(losses), rtol=1e-5)
    np.testing.assert_allclose(float(cnt_sh), np.mean(cnts), rtol=1e-5)
    if "emap" in state:
        # psum'd splat == one splat over the concatenated ray set
        cat = lambda xs: jnp.concatenate([jnp.asarray(x) for x in xs])
        emap_ref = splat_errors(
            state["emap"],
            cat([m[0] for m in metas]), cat([m[1] for m in metas]),
            cat([m[2] for m in metas]), cat(per_rays),
        )
        np.testing.assert_allclose(
            np.asarray(st_sh["emap"]["error"]),
            np.asarray(emap_ref["error"]), rtol=1e-5, atol=1e-7,
        )


@pytest.mark.slow
def test_sharded_render_matches_single_chip(setup):
    eng, ds = setup
    mesh = make_ray_mesh(8)
    state = replicate(eng.init(0), mesh)
    key = jax.random.PRNGKey(1)
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, _, _ = eng.train_bundle_multichip(state, sub, mesh)
    from sienerf_tpu.ops.optim import inference_params

    params = inference_params(state["opt"], state["params"])
    bf = state["occ"]["bitfield"]
    res = 32
    fl = (float(ds.focal_lengths[0, 0]) * res / ds.resolution[0],) * 2
    rgba_multi, depth_multi = eng.render_frame_multichip(
        params, bf, res, res, ds.xforms[0], fl, mesh, tile=64
    )
    rgba_single, depth_single = eng.render_frame(params, bf, res, res, ds.xforms[0], fl, tile=256)
    assert np.allclose(np.asarray(rgba_multi), np.asarray(rgba_single), atol=1e-4)
    assert np.allclose(np.asarray(depth_multi), np.asarray(depth_single), atol=1e-3)


@pytest.mark.slow
def test_sharded_baked_render_matches_single_chip(setup):
    """Baked renderer sharded over the rays axis must match the single-chip
    baked frame (grid + params + bitfield replicated)."""
    import jax.numpy as jnp

    from sienerf_tpu.engines.nerf_baked import (
        render_frame_baked,
        render_frame_baked_multichip,
    )
    from sienerf_tpu.ops.optim import inference_params

    eng, ds = setup
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, loss, _ = eng.train_bundle(state, sub)
    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]
    grid, meta = eng.bake_features(params, state["occ"], resolution=48)
    cam = ds.xforms[0]
    focal = tuple(np.asarray(ds.focal_lengths[0], np.float32))
    res = 32
    single, _ = render_frame_baked(
        eng, params, bitfield, grid, cam, focal, width=res, height=res,
        resolution=meta["resolution"], mode=meta["mode"],
        n_cascades=meta["n_cascades"], tile=1 << 10, candidates=64, evals=16,
        min_transmittance=1e-4,
    )
    mesh = make_ray_mesh(8)
    multi, _ = render_frame_baked_multichip(
        eng, replicate(params, mesh), replicate(bitfield, mesh),
        replicate(grid, mesh), cam, focal, mesh, width=res, height=res,
        resolution=meta["resolution"], mode=meta["mode"],
        n_cascades=meta["n_cascades"], tile=128, candidates=64, evals=16,
        min_transmittance=1e-4,
    )
    a, b = np.asarray(single), np.asarray(multi)
    assert np.isfinite(b).all()
    # same field, same chain, and (since r4) the SAME entry-advance policy:
    # render_rays_baked applies the single-chip frame-init advance+retreat
    # when init_advance_iters is passed, so the sharded baked frame is
    # pixel-equal, matching the live sharded render's bar (VERDICT r3 #6)
    assert np.allclose(a, b, atol=1e-4), float(np.abs(a - b).max())


@pytest.mark.slow
def test_multi_view_fanout(setup):
    """V views rendered in one sharded dispatch match per-view renders
    (reference multi-view fan-out, testbed.cu:2964-3227 reimagined as one
    concatenated sharded ray stream)."""
    import jax.numpy as jnp

    eng, ds = setup
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, loss, _ = eng.train_bundle(state, sub)
    from sienerf_tpu.ops.optim import inference_params

    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]
    mesh = make_ray_mesh(8)
    res = 24
    cams = jnp.asarray(ds.xforms[:3])
    fls = jnp.asarray(ds.focal_lengths[:3])
    rgba, depth = eng.render_views_multichip(
        replicate(params, mesh), replicate(bitfield, mesh), res, res,
        cams, fls, mesh, tile=64,
    )
    assert rgba.shape == (3, res, res, 4) and depth.shape == (3, res, res)
    for v in range(3):
        single, _ = eng.render_frame_multichip(
            params, bitfield, res, res, ds.xforms[v],
            tuple(np.asarray(ds.focal_lengths[v])), mesh, tile=64,
        )
        mse = float(np.mean((np.asarray(rgba[v]) - np.asarray(single)) ** 2))
        assert mse < 1e-6, (v, mse)

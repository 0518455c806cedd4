"""Fused Pallas sweep composite vs the XLA scan composite: pixel equality
on a random multi-cascade volume (interpret mode — the TPU A/B is
tools/ab_sweep_pallas.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sienerf_tpu.ops.sweep import sweep_composite
from sienerf_tpu.ops.sweep_pallas import sweep_composite_pallas


def _mk(R=16, K=2, Hi=32, Wi=128, seed=0):
    k = jax.random.PRNGKey(seed)
    Rv = R + 1
    vol = jax.random.uniform(k, (K, Rv, 4, Rv, Rv), jnp.float32)
    # premultiplied volume: sigma channel modest, some empty slabs
    vol = vol.at[:, :, 3].multiply(4.0)
    vol = vol.at[:, : Rv // 4, 3].set(0.0)
    vol = vol.astype(jnp.bfloat16)
    slab_live = jnp.any(vol[:, :, 3] > 0, axis=(2, 3))
    o_c = jnp.asarray([-0.7, 0.45, 0.55], jnp.float32)
    eb = jnp.linspace(-0.4, 0.5, Hi)
    ec = jnp.linspace(-0.45, 0.4, Wi)
    return vol, slab_live, o_c, eb, ec


@pytest.mark.parametrize("interp", ["nearest", "bilinear"])
def test_pallas_matches_xla(interp):
    R, K = 16, 2
    vol, slab_live, o_c, eb, ec = _mk(R, K)
    args = (vol, slab_live, o_c, eb, ec, 0.05, 1e-4)
    C0, op0, T0, bt0 = sweep_composite(
        *args, resolution=R, n_cascades=K, interp=interp)
    C1, op1, T1, bt1 = sweep_composite_pallas(
        *args, resolution=R, n_cascades=K, interp=interp,
        block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C0),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T0),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(op1), np.asarray(op0),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(bt1), np.asarray(bt0),
                               rtol=1e-4, atol=2e-4)


def test_pallas_t_stop():
    """Per-pixel depth stop (hybrid blend): stopping at t caps the
    composite exactly like an opaque surface at that depth — samples with
    t_hat > t_stop contribute nothing."""
    R, K = 16, 2
    vol, slab_live, o_c, eb, ec = _mk(R, K)
    Hi, Wi = eb.shape[0], ec.shape[0]
    # a diagonal depth wall across the image
    stop = jnp.linspace(0.3, 1.6, Hi)[:, None] * jnp.ones((1, Wi))
    C, op, T, bt = sweep_composite_pallas(
        vol, slab_live, o_c, eb, ec, 0.05, 0.0, stop,
        resolution=R, n_cascades=K, block_rows=8, interpret=True)
    # unstopped reference
    C0, op0, T0, _ = sweep_composite_pallas(
        vol, slab_live, o_c, eb, ec, 0.05, 0.0,
        resolution=R, n_cascades=K, block_rows=8, interpret=True)
    C, op, C0, op0 = map(np.asarray, (C, op, C0, op0))
    # stopped rows accumulate strictly less opacity; a far stop changes
    # nothing (t beyond the volume)
    assert (np.asarray(op) <= np.asarray(op0) + 1e-5).all()
    far = sweep_composite_pallas(
        vol, slab_live, o_c, eb, ec, 0.05, 0.0,
        jnp.full((Hi, Wi), 1e9, jnp.float32),
        resolution=R, n_cascades=K, block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(far[0]), C0, rtol=1e-5, atol=1e-5)
    # at least some pixels actually got cut
    assert (op < op0 - 1e-3).any()


@pytest.fixture(scope="module")
def trained_small():
    from sienerf_tpu.engines.nerf import NerfEngine

    from test_nerf_mode import make_dataset, tiny_config

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 14,
                            grid_size=32, train_k=48)
    eng.train_march_iters = 128
    eng._phase = "fast"
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, loss, _ = eng.train_bundle(state, sub)
    return eng, state, ds


def test_render_frame_pallas_matches_xla(trained_small):
    """Full sweep frame with the fused Pallas composite == the XLA scan
    composite (same prep, same warp — only the composite differs)."""
    from sienerf_tpu.engines.nerf_sweep import render_frame_sweep
    from sienerf_tpu.ops.optim import inference_params

    eng, state, ds = trained_small
    params = inference_params(state["opt"], state["params"])
    grid, meta = eng.bake_features(params, state["occ"], resolution=32,
                                   mode="nearest")
    cam = ds.xforms[0]
    focal = tuple(np.asarray(ds.focal_lengths[0], np.float32))
    H = W = 64
    a, da = render_frame_sweep(
        eng, params, grid, meta, cam, focal, width=W, height=H,
        min_transmittance=1e-4, impl="xla")
    b, db = render_frame_sweep(
        eng, params, grid, meta, cam, focal, width=W, height=H,
        min_transmittance=1e-4, impl="pallas")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(da),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("phase", [0.0, 0.4375])
def test_pallas_phase_matches_xla(phase):
    """Slab-phase jitter: the Pallas kernel's two-block blend equals the
    XLA path's dynamic-slice blend at the same phase."""
    R, K = 16, 2
    vol, slab_live, o_c, eb, ec = _mk(R, K)
    args = (vol, slab_live, o_c, eb, ec, 0.05, 1e-4)
    C0, op0, T0, bt0 = sweep_composite(
        *args, phase=jnp.float32(phase), resolution=R, n_cascades=K)
    C1, op1, T1, bt1 = sweep_composite_pallas(
        *args, None, jnp.float32(phase), resolution=R, n_cascades=K,
        block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C0),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T0),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(bt1), np.asarray(bt0),
                               rtol=1e-4, atol=2e-4)

"""Fused Pallas shade kernel vs the XLA scan prep: volume equality in
interpret mode, and the full fused-prep frame vs the XLA frame."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_nerf_mode import make_dataset, tiny_config


@pytest.fixture(scope="module")
def trained_small():
    from sienerf_tpu.engines.nerf import NerfEngine

    ds = make_dataset()
    eng = NerfEngine.create(tiny_config(), ds, train_batch_size=1 << 14,
                            grid_size=32, train_k=48)
    eng.train_march_iters = 128
    eng._phase = "fast"
    state = eng.init(0)
    key = jax.random.PRNGKey(0)
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, loss, _ = eng.train_bundle(state, sub)
    return eng, state, ds


def test_shade_volume_matches_xla_prep(trained_small):
    from sienerf_tpu.engines.nerf_sweep import (
        _fused_prep_eligible,
        prepare_rgba_volume,
    )
    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.ops.shade_pallas import (
        build_fieldmajor_planes,
        shade_volume_pallas,
    )

    eng, state, ds = trained_small
    params = inference_params(state["opt"], state["params"])
    grid, meta = eng.bake_features(params, state["occ"], resolution=32,
                                   mode="nearest")
    assert _fused_prep_eligible(eng, grid)
    R, K = meta["resolution"], meta["n_cascades"]
    Rv = R + 1
    cam = jnp.asarray([0.1, 1.4, -0.6], jnp.float32)

    ref = prepare_rgba_volume(eng, params, grid["rows"], grid["scale"],
                              cam, R, K)
    # axis-0 oriented reference: (K, i, 4, j, k)
    ref0 = jnp.transpose(ref, (0, 1, 4, 2, 3))

    fm = build_fieldmajor_planes(grid["rows"], R, K)
    vol = shade_volume_pallas(
        fm, grid["scale"], cam, tuple(params["rgb_mlp"]),
        resolution=R, n_cascades=K,
        density_act=eng.net.density_activation.name.lower(),
        rgb_act=eng.net.rgb_activation.name.lower(),
        interpret=True)
    got = vol[:, :, :, :Rv, :Rv]
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref0, np.float32),
        rtol=2e-2, atol=2e-3)
    # padded region must be exactly empty
    assert float(jnp.abs(vol[:, :, :, Rv:, :].astype(jnp.float32)).max()) == 0
    assert float(jnp.abs(vol[:, :, :, :, Rv:].astype(jnp.float32)).max()) == 0


def test_fused_prep_frame_matches_xla(trained_small):
    """render_frame_sweep with the fused shade prep (pallas path +
    schedule-side flip) == the XLA frame, across axes and flips."""
    from sienerf_tpu.engines.nerf_sweep import render_frame_sweep
    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.utils.camera import look_at_matrix

    eng, state, ds = trained_small
    params = inference_params(state["opt"], state["params"])
    grid, meta = eng.bake_features(params, state["occ"], resolution=32,
                                   mode="nearest")
    H = W = 64
    views = [
        look_at_matrix([0.5, 0.5, -1.6], [0.5, 0.5, 0.5]),   # axis 2
        look_at_matrix([2.1, 0.5, 0.6], [0.5, 0.5, 0.5]),    # axis 0, flip
        look_at_matrix([0.4, -1.3, 0.5], [0.5, 0.5, 0.5]),   # axis 1
    ]
    for cam in views:
        a, da = render_frame_sweep(
            eng, params, grid, meta, cam, (48.0, 48.0), width=W, height=H,
            min_transmittance=1e-4, impl="xla")
        b, db = render_frame_sweep(
            eng, params, grid, meta, cam, (48.0, 48.0), width=W, height=H,
            min_transmittance=1e-4, impl="pallas")
        assert "rows_fm" in grid  # the fused prep actually engaged
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-2, atol=5e-3)

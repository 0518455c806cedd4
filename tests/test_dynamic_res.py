"""Dynamic-res controller + foveation warp math."""

import numpy as np

from sienerf_tpu.utils.dynamic_res import DynamicResController, Foveation


def test_dynamic_res_converges():
    ctl = DynamicResController(target_ms=30.0)
    # machine renders at cost proportional to pixel count: full frame 120ms
    for _ in range(20):
        measured = 120.0 * ctl.factor**2
        ctl.update(measured)
    # steady state: 120 * f^2 ~ 30 -> f ~ 0.5
    assert 0.35 < ctl.factor < 0.65, ctl.factor
    w, h = ctl.resolution(1920, 1080)
    assert w % 16 == 0 and w < 1920


def test_dynamic_res_hysteresis():
    ctl = DynamicResController(target_ms=30.0, factor=0.5)
    f0 = ctl.factor
    ctl.update(31.0)  # within 20% band: no change
    assert ctl.factor == f0


def test_foveation_roundtrip_and_density():
    fov = Foveation(density=2.0, center=0.5)
    t = np.linspace(0.0, 1.0, 33)
    u = fov.unwarp(t)
    assert np.isclose(u[0], 0) and np.isclose(u[-1], 1)
    t2 = fov.warp(u)
    assert np.allclose(t2, t, atol=1e-6)
    # the warp concentrates render samples at the center: display-space step
    # per render-space step is smallest at the focus
    du = np.diff(u)
    assert du[len(du) // 2] < du[0]
    assert du[len(du) // 2] < du[-1]


def test_foveation_identity():
    fov = Foveation(density=1.0)
    t = np.linspace(0, 1, 9)
    assert np.allclose(fov.unwarp(t), t)

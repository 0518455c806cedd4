"""Viewer tier: dynamic-res rung controller + orbit camera math.

(The HTTP server and foveated render path are exercised by
tools/orbit_render.py against a live session; these are the host-math
units.)"""

import numpy as np

from sienerf_tpu.viewer import FrameController, orbit_camera


def test_frame_controller_descends_rungs_under_load():
    fc = FrameController(640, 360, target_ms=100.0)
    assert fc.rung == 1.0
    # consistently slow frames walk down the rung ladder
    for _ in range(8):
        fc.update(1600.0)
    assert fc.rung == 0.125
    w, h = fc.resolution()
    assert w <= 640 * 0.125 + 16 and h <= 360 * 0.125 + 16
    assert w % 16 == 0 or w == 32


def test_frame_controller_recovers():
    fc = FrameController(640, 360, target_ms=100.0)
    for _ in range(8):
        fc.update(1600.0)
    for _ in range(12):
        fc.update(3.0)  # plenty of headroom
    assert fc.rung == 1.0


def test_frame_controller_hysteresis_holds_rung():
    fc = FrameController(640, 360, target_ms=100.0)
    for _ in range(6):
        fc.update(101.0)  # within +-20% band: no movement
    assert fc.rung == 1.0


def test_orbit_camera_looks_at_center():
    center = np.array([0.5, 0.5, 0.5])
    for theta, phi, r in [(0.0, 0.0, 2.0), (1.3, 0.7, 1.0), (-2.0, -0.5, 3.0)]:
        cam = orbit_camera(center, r, theta, phi)
        assert cam.shape == (3, 4)
        eye = cam[:, 3]
        assert abs(np.linalg.norm(eye - center) - r) < 1e-5
        # view axis (+z column by our convention) points from eye to center
        fwd = cam[:, 2]
        want = (center - eye) / np.linalg.norm(center - eye)
        assert np.allclose(fwd, want, atol=1e-5) or np.allclose(-fwd, want, atol=1e-5)

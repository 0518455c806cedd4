"""Camera path spline + JSON roundtrip."""

import numpy as np

from sienerf_tpu.utils.camera import look_at_matrix
from sienerf_tpu.utils.camera_path import CameraPath, mat_to_quat, quat_to_mat, slerp


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(16):
        cam = look_at_matrix(rng.normal(size=3), rng.normal(size=3))
        R = cam[:3, :3]
        R2 = quat_to_mat(mat_to_quat(R))
        assert np.allclose(R, R2, atol=1e-6)


def test_slerp_endpoints():
    q0 = mat_to_quat(look_at_matrix([1, 0, 0], [0, 0, 0])[:3, :3])
    q1 = mat_to_quat(look_at_matrix([0, 1, 0.01], [0, 0, 0])[:3, :3])
    assert np.allclose(np.abs(np.dot(slerp(q0, q1, 0.0), q0)), 1.0, atol=1e-6)
    assert np.allclose(np.abs(np.dot(slerp(q0, q1, 1.0), q1)), 1.0, atol=1e-6)


def test_path_eval_and_json(tmp_path):
    cp = CameraPath.orbit([0.5, 0.5, 0.5], 1.0, 0.3, n=6)
    k = cp.eval(0.0)
    # keyframe positions are interpolated exactly at knots
    assert np.allclose(k.xform[:3, 3], cp.keyframes[0].xform[:3, 3], atol=1e-5)
    mid = cp.eval(0.5)
    assert np.isfinite(mid.xform).all()
    # orientation stays orthonormal along the path
    for t in np.linspace(0, 1, 13):
        R = cp.eval(float(t)).xform[:3, :3]
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-5)
    p = tmp_path / "path.json"
    cp.save(p)
    cp2 = CameraPath.load(p)
    assert len(cp2.keyframes) == 6
    assert np.allclose(cp2.eval(0.3).xform, cp.eval(0.3).xform, atol=1e-5)

"""Camera / lens math: pixel -> ray generation, vectorized over whole frames.

Behavioral spec: reference common_device.cuh:340-560 (`pixel_to_ray`,
`uv_to_ray`, lens undistortion models, `latlong_to_dir`,
`equirectangular_to_dir`) and :631 (fov <-> focal length).

Camera matrices follow the NGP convention: a 3x4 matrix `[R | t]` whose
columns 0..2 are the camera-frame x/y/z axes in world space and column 3 the
camera origin.  Stored here as shape (3, 4) arrays.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from sienerf_tpu.common import LensMode


@dataclass(frozen=True)
class Lens:
    mode: LensMode = LensMode.PERSPECTIVE
    # OpenCV: k1 k2 p1 p2; fisheye: k1..k4; FTheta: r0..r4, resx, resy
    params: tuple = field(default_factory=tuple)

    @property
    def is_distorted(self) -> bool:
        return self.mode != LensMode.PERSPECTIVE and len(self.params) > 0


def fov_to_focal_length(resolution: float, degrees: float) -> float:
    return 0.5 * resolution / math.tan(0.5 * math.radians(degrees))


def focal_length_to_fov(resolution: float, focal_length: float) -> float:
    return 2.0 * math.degrees(math.atan(0.5 * resolution / focal_length))


def opencv_lens_distortion_delta(params, x, y):
    """Forward OpenCV radial+tangential distortion (common_device.cuh:360-380)."""
    k1, k2, p1, p2 = params[0], params[1], params[2], params[3]
    r2 = x * x + y * y
    radial = k1 * r2 + k2 * r2 * r2
    du = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    dv = y * radial + 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y)
    return du, dv


def iterative_opencv_lens_undistortion(params, x, y, n_iters: int = 8):
    """Fixed-point inversion of the distortion model (common_device.cuh:382-407)."""
    xd, yd = x, y
    for _ in range(n_iters):
        du, dv = opencv_lens_distortion_delta(params, x, y)
        x = xd - du
        y = yd - dv
    return x, y


def opencv_fisheye_distortion_delta(params, x, y):
    k1, k2, k3, k4 = params[0], params[1], params[2], params[3]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = jnp.where(r > 1e-8, theta_d / jnp.maximum(r, 1e-8), 1.0)
    return x * scale - x, y * scale - y


def iterative_opencv_fisheye_undistortion(params, x, y, n_iters: int = 8):
    xd, yd = x, y
    for _ in range(n_iters):
        du, dv = opencv_fisheye_distortion_delta(params, x, y)
        x = xd - du
        y = yd - dv
    return x, y


def latlong_to_dir(u, v):
    theta = (v - 0.5) * math.pi
    phi = (u - 0.5) * 2.0 * math.pi
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([sp * ct, st, cp * ct], axis=-1)


def dir_to_latlong_uv(d):
    """Inverse of latlong_to_dir; d is [..., 3] (need not be normalized)."""
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    theta = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 0], d[..., 2])
    u = phi / (2.0 * math.pi) + 0.5
    v = theta / math.pi + 0.5
    return jnp.stack([u, v], axis=-1)


def equirectangular_to_dir(u, v):
    ct = (v - 0.5) * 2.0
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = (u - 0.5) * 2.0 * math.pi
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([sp * st, ct, cp * st], axis=-1)


def f_theta_undistortion(params, u, v):
    """r-polynomial fisheye (common_device.cuh:360-373). params: r0..r4, resx, resy."""
    xpix = u * params[5]
    ypix = v * params[6]
    norm = jnp.sqrt(xpix * xpix + ypix * ypix)
    alpha = params[0] + norm * (params[1] + norm * (params[2] + norm * (params[3] + norm * params[4])))
    sa, ca = jnp.sin(alpha), jnp.cos(alpha)
    inv_norm = jnp.where(norm > 0, 1.0 / jnp.maximum(norm, 1e-12), 0.0)
    s = sa * inv_norm
    return jnp.stack([s * xpix, s * ypix, ca], axis=-1)


def uv_to_ray(
    uv,
    resolution,
    focal_length,
    camera_matrix,
    screen_center=(0.5, 0.5),
    lens: Lens = Lens(),
    distortion_grid=None,
    near_distance: float = 0.0,
    aperture_size: float = 0.0,
    focus_z: float = 1.0,
    aperture_uv=None,
):
    """Vectorized uv -> (origin, direction).

    uv: [..., 2] in [0,1]^2; camera_matrix: (3,4) (or broadcastable [...,3,4]).
    Returns (origin [...,3], dir [...,3]); dir is NOT normalized (z=1 in
    camera frame before rotation), matching the reference so that `depth`
    means z-depth along the view axis.
    """
    camera_matrix = jnp.asarray(camera_matrix, jnp.float32)
    res = jnp.asarray(resolution, jnp.float32)
    fl = jnp.asarray(focal_length, jnp.float32)
    sc = jnp.asarray(screen_center, jnp.float32)
    u, v = uv[..., 0], uv[..., 1]

    if lens.mode == LensMode.FTHETA:
        dir_cam = f_theta_undistortion(lens.params, u - sc[0], v - sc[1])
    elif lens.mode == LensMode.LATLONG:
        dir_cam = latlong_to_dir(u, v)
    elif lens.mode == LensMode.EQUIRECTANGULAR:
        dir_cam = equirectangular_to_dir(u, v)
    else:
        x = (u - sc[0]) * res[0] / fl[0]
        y = (v - sc[1]) * res[1] / fl[1]
        if lens.mode == LensMode.OPENCV and lens.is_distorted:
            x, y = iterative_opencv_lens_undistortion(lens.params, x, y)
        elif lens.mode == LensMode.OPENCV_FISHEYE and lens.is_distorted:
            x, y = iterative_opencv_fisheye_undistortion(lens.params, x, y)
        dir_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    if distortion_grid is not None:
        # trainable 32x32 2-channel distortion map, bilinear at uv
        from sienerf_tpu.ops.grids import bilinear_sample_2d

        delta = bilinear_sample_2d(distortion_grid, uv)
        dir_cam = dir_cam.at[..., :2].add(delta)

    rot = camera_matrix[..., :3, :3]
    origin = jnp.broadcast_to(camera_matrix[..., :3, 3], dir_cam.shape)
    # ray directions must be full f32: TPU default matmul precision is bf16
    # (ops/exact.py policy) and a ~4e-3 direction error moves samples a
    # whole fine voxel; the contraction is size-3, HIGHEST costs nothing
    hi = jax.lax.Precision.HIGHEST
    direction = jnp.einsum("...ij,...j->...i", rot, dir_cam, precision=hi)

    if aperture_size > 0.0 and aperture_uv is not None:
        # depth-of-field: jitter origin on the aperture disk, refocus at focus_z
        lookat = origin + direction * focus_z
        blur = aperture_size * aperture_uv  # [...,2] points on unit disk
        origin = origin + jnp.einsum(
            "...ij,...j->...i", camera_matrix[..., :3, :2], blur, precision=hi
        )
        direction = (lookat - origin) / focus_z

    origin = origin + direction * near_distance
    return origin, direction


def pixel_grid_uv(width: int, height: int, jitter=None):
    """uv coords for a full frame; jitter in [0,1)^2 per pixel (None -> centers)."""
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    px, py = jnp.meshgrid(x, y, indexing="xy")  # [H, W]
    off = jnp.asarray([0.5, 0.5], jnp.float32) if jitter is None else jitter
    u = (px + off[..., 0]) / width
    v = (py + off[..., 1]) / height
    return jnp.stack([u, v], axis=-1)  # [H, W, 2]


def rotation_to_quat(R):
    """(...,3,3) rotation matrices -> (...,4) quaternions (w,x,y,z)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # branchless Shepperd's method: compute all four candidate forms, pick
    # the numerically safest (largest pivot)
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotation(q):
    """(...,4) quaternions (w,x,y,z) -> (...,3,3) rotation matrices."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def camera_slerp(xf_a, xf_b, t):
    """Slerp between (...,3,4) camera matrices at per-item t (...,).

    Reference camera_slerp (common_device.cuh:651-654): rotation slerp +
    translation lerp — used by rolling-shutter / motion-blur ray generation
    via get_xform_given_rolling_shutter (common_device.cuh:656-659).
    """
    t = jnp.asarray(t, jnp.float32)[..., None]
    qa = rotation_to_quat(xf_a[..., :3, :3])
    qb = rotation_to_quat(xf_b[..., :3, :3])
    # shortest arc
    dot = jnp.sum(qa * qb, axis=-1, keepdims=True)
    qb = jnp.where(dot < 0, -qb, qb)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-5
    wa = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    wb = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    q = wa * qa + wb * qb
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    R = quat_to_rotation(q)
    trans = xf_a[..., :3, 3] * (1.0 - t) + xf_b[..., :3, 3] * t
    return jnp.concatenate([R, trans[..., None]], axis=-1)


def look_at_matrix(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Build an NGP-convention (3,4) camera matrix looking from eye to target."""
    eye = np.asarray(eye, np.float32)
    fwd = np.asarray(target, np.float32) - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    m = np.stack([right, down, fwd, eye], axis=1).astype(np.float32)  # (3,4)
    return m

"""Dataset converters: record3d / NSVF / nerfcapture -> transforms.json.

Behavioral spec: reference scripts/record3d2nerf.py (:1-176),
scripts/nsvf2nerf.py (:1-162), scripts/nerfcapture2nerf.py (:1-243) — each
parses a capture format's poses/intrinsics and emits an NGP transforms.json
(NeRF-convention camera-to-world, shared intrinsics, aabb_scale).
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np


def _quat_to_mat(q):
    x, y, z, w = q  # record3d uses xyzw
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def record3d_to_transforms(metadata_path: str | Path, images_rel: str = "rgb", aabb_scale: int = 16) -> dict:
    """Convert a Record3D `metadata.json` (poses as [qx,qy,qz,qw,tx,ty,tz],
    intrinsics matrix K) to transforms.json (reference record3d2nerf.py)."""
    meta = json.loads(Path(metadata_path).read_text())
    K = np.asarray(meta["K"], np.float64).reshape(3, 3).T
    w = meta.get("w", 720)
    h = meta.get("h", 960)
    frames = []
    for i, pose in enumerate(meta["poses"]):
        q = pose[:4]
        t = np.asarray(pose[4:7], np.float64)
        c2w = np.eye(4)
        c2w[:3, :3] = _quat_to_mat(q)
        c2w[:3, 3] = t
        # record3d camera looks +z with y down; flip into NeRF convention
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1
        frames.append({"file_path": f"{images_rel}/{i}.jpg", "transform_matrix": c2w.tolist()})
    return {
        "fl_x": float(K[0, 0]),
        "fl_y": float(K[1, 1]),
        "cx": float(K[0, 2]),
        "cy": float(K[1, 2]),
        "w": w,
        "h": h,
        "camera_angle_x": 2 * math.atan(w / (2 * K[0, 0])),
        "aabb_scale": aabb_scale,
        "frames": frames,
    }


def nsvf_to_transforms(
    dataset_dir: str | Path, split_prefix: str = "0_", aabb_scale: int = 1
) -> dict:
    """Convert an NSVF-format dataset (pose/*.txt 4x4 matrices +
    intrinsics.txt + rgb/*) to transforms.json (reference nsvf2nerf.py).

    NSVF poses are OpenCV-convention camera-to-world; NeRF convention flips
    the y/z camera axes.
    """
    root = Path(dataset_dir)
    intr = (root / "intrinsics.txt").read_text().split()
    focal = float(intr[0])
    cx, cy = float(intr[2]), float(intr[6]) if len(intr) > 6 else float(intr[3])
    frames = []
    w = h = None
    for pose_file in sorted((root / "pose").glob(f"{split_prefix}*.txt")):
        m = np.asarray([float(v) for v in pose_file.read_text().split()], np.float64).reshape(4, 4)
        m[:3, 1] *= -1
        m[:3, 2] *= -1
        name = pose_file.stem
        img = None
        for ext in (".png", ".jpg"):
            cand = root / "rgb" / f"{name}{ext}"
            if cand.exists():
                img = cand
                break
        frames.append(
            {"file_path": f"rgb/{name}" + (img.suffix if img else ".png"), "transform_matrix": m.tolist()}
        )
    out = {
        "fl_x": focal,
        "fl_y": focal,
        "cx": cx,
        "cy": cy,
        "aabb_scale": aabb_scale,
        "frames": frames,
    }
    if w:
        out["w"], out["h"] = w, h
    return out


def mask_images(image_dir: str | Path, mask_dir: str | Path, out_dir: str | Path, mask_color=0) -> int:
    """Apply binary masks as alpha (reference scripts/mask_images.py)."""
    from sienerf_tpu.io.image_io import load_image, save_image

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for img_path in sorted(Path(image_dir).iterdir()):
        if img_path.suffix.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        mask_path = Path(mask_dir) / img_path.name
        if not mask_path.exists():
            continue
        img = load_image(img_path, as_float_linear=False)
        mask = load_image(mask_path, as_float_linear=False)
        img[..., 3] = (mask[..., 0] > 0.5).astype(np.float32)
        save_image(out / (img_path.stem + ".png"), img, input_is_linear=False)
        n += 1
    return n

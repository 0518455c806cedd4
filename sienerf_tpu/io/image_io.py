"""Image loading/saving: EXR (HDR linear), PNG/JPG (LDR sRGB).

Behavioral spec: reference tinyexr_wrapper.cu + stbi usage in
nerf_loader.cu / testbed_image.cu: EXR loads as linear half/float RGBA;
LDR images load as sRGB bytes converted to linear, with alpha
premultiplication handled by callers.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")


def load_image(path: str | Path, as_float_linear: bool = True) -> np.ndarray:
    """Load any supported image as (H, W, 4) float32.

    EXR: linear values as stored.  LDR: bytes / 255 converted sRGB->linear
    when `as_float_linear` (alpha stays linear).
    """
    path = Path(path)
    ext = path.suffix.lower()
    if ext == ".exr":
        return _load_exr(path)
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(f"failed to load image {path}")
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    if img.shape[-1] >= 3:
        img = img.copy()
        img[..., :3] = img[..., 2::-1]  # BGR -> RGB
    img = img.astype(np.float32)
    if img.max() > 1.5:  # byte or uint16 input
        img = img / (255.0 if img.max() <= 255.0 else 65535.0)
    if img.shape[-1] == 3:
        img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
    if as_float_linear:
        rgb = img[..., :3]
        img[..., :3] = np.where(rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4)
    return img


def _load_exr(path: Path) -> np.ndarray:
    from sienerf_tpu.io.exr import load_exr_rgba

    return load_exr_rgba(path)


def save_image(path: str | Path, img: np.ndarray, input_is_linear: bool = True) -> None:
    """Save (H, W, 3|4) float image. EXR keeps linear; LDR converts to sRGB bytes."""
    import cv2

    path = Path(path)
    img = np.asarray(img, np.float32)
    ext = path.suffix.lower()
    if ext == ".exr":
        from sienerf_tpu.io.exr import write_exr

        write_exr(path, img)
        return
    rgb = np.clip(img[..., :3], 0.0, 1.0)
    if input_is_linear:
        rgb = np.where(rgb <= 0.0031308, 12.92 * rgb, 1.055 * np.power(np.maximum(rgb, 1e-8), 1 / 2.4) - 0.055)
    out = (np.clip(rgb, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    if img.shape[-1] == 4:
        a = (np.clip(img[..., 3:4], 0, 1) * 255.0 + 0.5).astype(np.uint8)
        out = np.concatenate([out[..., 2::-1], a], axis=-1)  # BGRA
    else:
        out = out[..., ::-1]  # BGR
    cv2.imwrite(str(path), out)

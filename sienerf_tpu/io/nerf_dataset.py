"""NeRF dataset loader: transforms.json + images.

Behavioral spec: reference src/nerf_loader.cu:273-700 (`load_nerf`) and
include/neural-graphics-primitives/nerf_loader.h:29-168 (coordinate
conventions).  Key conventions preserved exactly:

- NGP world space: the scene is mapped near the unit cube; dataset `scale`
  defaults to NERF_SCALE=0.33 and `offset` to (0.5,0.5,0.5)
  (nerf_loader.h:29-33).
- Camera matrices convert from NeRF convention by cycling axes xyz<-yzx and
  negating columns 1 and 2 (nerf_loader.h:101-120: `nerf_matrix_to_ngp`).
- Per-dataset lens (k1 k2 p1 p2 -> OpenCV; fisheye flag; ftheta params),
  principal point cx/cy, focal from fl_x/fl_y or camera_angle_x/y
  (nerf_loader.cu:175-230 `read_lens`).
- LDR images are kept in sRGB (the reference trains NeRF in sRGB space by
  default — linear_colors=false), with alpha premultiplied over the
  background during loss computation, not here.
"""

from __future__ import annotations

import concurrent.futures as futures
import json
import math
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from sienerf_tpu.common import NERF_SCALE, LensMode
from sienerf_tpu.utils import log
from sienerf_tpu.utils.camera import Lens


def nerf_matrix_to_ngp(m: np.ndarray, scale: float, offset: np.ndarray) -> np.ndarray:
    """(3|4,4) NeRF-convention camera-to-world -> NGP (3,4).

    Matches nerf_loader.h:101-120: negate columns 1,2; scale+offset the
    translation; cycle rows xyz<-yzx.
    """
    m = np.asarray(m, np.float32)[:3, :]  # (3,4)
    out = m.copy()
    out[:, 1] *= -1.0
    out[:, 2] *= -1.0
    out[:, 3] = out[:, 3] * scale + offset
    # cycle rows: new row0 = old row1, row1 = old row2, row2 = old row0
    out = out[[1, 2, 0], :]
    return out


def ngp_matrix_to_nerf(m: np.ndarray, scale: float, offset: np.ndarray) -> np.ndarray:
    out = np.asarray(m, np.float32)[[2, 0, 1], :].copy()
    out[:, 1] *= -1.0
    out[:, 2] *= -1.0
    out[:, 3] = (out[:, 3] - offset) / scale
    return out


def nerf_position_to_ngp(p: np.ndarray, scale: float, offset: np.ndarray) -> np.ndarray:
    rv = np.asarray(p, np.float32) * scale + offset
    return rv[..., [1, 2, 0]]


def ngp_position_to_nerf(p: np.ndarray, scale: float, offset: np.ndarray) -> np.ndarray:
    return (np.asarray(p, np.float32)[..., [2, 0, 1]] - offset) / scale


@dataclass
class NerfDataset:
    """All images share one resolution (reference supports per-image; we pad)."""

    images: np.ndarray  # (N, H, W, 4) float32, sRGB (LDR) or linear (HDR)
    xforms: np.ndarray  # (N, 3, 4) NGP-convention camera-to-world
    focal_lengths: np.ndarray  # (N, 2)
    principal_points: np.ndarray  # (N, 2) in [0,1]
    resolution: tuple[int, int]  # (W, H)
    lens: Lens = field(default_factory=Lens)
    aabb_scale: float = 1.0
    scale: float = NERF_SCALE
    offset: np.ndarray = field(default_factory=lambda: np.full(3, 0.5, np.float32))
    is_hdr: bool = False
    depths: np.ndarray | None = None  # (N, H, W) optional metric depth
    sharpness: np.ndarray | None = None
    n_extra_learnable_dims: int = 0
    paths: list = field(default_factory=list)

    @property
    def n_images(self) -> int:
        return self.images.shape[0]


def _resolve_image_path(base: Path, file_path: str) -> Path | None:
    p = base / file_path
    if p.exists() and p.is_file():
        return p
    for ext in (".png", ".jpg", ".jpeg", ".exr"):
        q = base / (file_path + ext)
        if q.exists():
            return q
    return None


def load_nerf_dataset(
    path: str | Path,
    split: str = "train",
    downscale: int = 1,
    max_images: int | None = None,
) -> NerfDataset:
    """Load a directory containing transforms.json (or transforms_{split}.json)."""
    path = Path(path)
    if path.is_file():
        json_paths = [path]
        base = path.parent
    else:
        base = path
        candidates = [path / f"transforms_{split}.json", path / "transforms.json"]
        json_paths = [p for p in candidates if p.exists()][:1]
        if not json_paths:
            # multi-json merge (reference merges all *.json in dir)
            json_paths = sorted(path.glob("transforms*.json"))
        if not json_paths:
            raise FileNotFoundError(f"no transforms json under {path}")

    meta: dict = {}
    frames: list[dict] = []
    for jp in json_paths:
        j = json.loads(jp.read_text())
        frames.extend(j.get("frames", []))
        for k, v in j.items():
            if k != "frames":
                meta.setdefault(k, v)

    scale = float(meta.get("scale", NERF_SCALE))
    offset = np.asarray(meta.get("offset", [0.5, 0.5, 0.5]), np.float32)
    aabb_scale = float(meta.get("aabb_scale", 1))

    if max_images:
        frames = frames[:max_images]

    from sienerf_tpu.io.image_io import load_image

    def load_one(fr):
        p = _resolve_image_path(base, fr["file_path"])
        if p is None:
            return None
        # NeRF default trains in sRGB: keep LDR pixels as-stored (sRGB),
        # HDR EXR stays linear.
        img = load_image(p, as_float_linear=(p.suffix.lower() == ".exr"))
        if downscale > 1:
            img = img[::downscale, ::downscale]
        return p, img

    with futures.ThreadPoolExecutor(max_workers=16) as ex:
        loaded = list(ex.map(load_one, frames))

    kept = [(fr, pl) for fr, pl in zip(frames, loaded) if pl is not None]
    if not kept:
        raise FileNotFoundError(f"no images found for {path}")
    frames = [fr for fr, _ in kept]
    paths = [pl[0] for _, pl in kept]
    imgs = [pl[1] for _, pl in kept]
    h = max(im.shape[0] for im in imgs)
    w = max(im.shape[1] for im in imgs)
    images = np.zeros((len(imgs), h, w, 4), np.float32)
    for i, im in enumerate(imgs):
        images[i, : im.shape[0], : im.shape[1]] = im

    is_hdr = paths[0].suffix.lower() == ".exr"

    def focal_from(meta_or_frame, axis, res, other_res, other_angle_key):
        fl_key = "fl_x" if axis == 0 else "fl_y"
        angle_key = "camera_angle_x" if axis == 0 else "camera_angle_y"
        if fl_key in meta_or_frame:
            return float(meta_or_frame[fl_key]) / downscale
        if angle_key in meta_or_frame:
            return 0.5 * res / math.tan(0.5 * float(meta_or_frame[angle_key]))
        return None

    xforms = np.zeros((len(frames), 3, 4), np.float32)
    fls = np.zeros((len(frames), 2), np.float32)
    pps = np.zeros((len(frames), 2), np.float32)
    sharp = np.zeros((len(frames),), np.float32)
    for i, fr in enumerate(frames):
        src = {**meta, **fr}
        xforms[i] = nerf_matrix_to_ngp(np.asarray(fr["transform_matrix"], np.float32), scale, offset)
        fx = focal_from(src, 0, w, h, "camera_angle_y")
        fy = focal_from(src, 1, h, w, "camera_angle_x")
        if fx is None and fy is None:
            raise ValueError("dataset specifies no focal length / camera angle")
        fls[i] = (fx if fx is not None else fy, fy if fy is not None else fx)
        pps[i] = (float(src.get("cx", w * downscale / 2)) / downscale / w, float(src.get("cy", h * downscale / 2)) / downscale / h)
        sharp[i] = float(fr.get("sharpness", 1.0))

    lens = Lens()
    if any(k in meta for k in ("k1", "k2", "p1", "p2")):
        params = tuple(float(meta.get(k, 0.0)) for k in ("k1", "k2", "p1", "p2"))
        mode = LensMode.OPENCV_FISHEYE if meta.get("is_fisheye", False) else LensMode.OPENCV
        lens = Lens(mode=mode, params=params)
    elif meta.get("camera_model") == "OPENCV_FISHEYE":
        params = tuple(float(meta.get(k, 0.0)) for k in ("k1", "k2", "k3", "k4"))
        lens = Lens(mode=LensMode.OPENCV_FISHEYE, params=params)

    log.info(
        f"loaded NeRF dataset: {len(frames)} images @ {w}x{h}, aabb_scale={aabb_scale}, "
        f"scale={scale}, lens={lens.mode.value}"
    )
    return NerfDataset(
        images=images,
        xforms=xforms,
        focal_lengths=fls,
        principal_points=pps,
        resolution=(w, h),
        lens=lens,
        aabb_scale=aabb_scale,
        scale=scale,
        offset=offset,
        is_hdr=is_hdr,
        sharpness=sharp,
        n_extra_learnable_dims=int(meta.get("n_extra_learnable_dims", 0)),
        paths=paths,
    )

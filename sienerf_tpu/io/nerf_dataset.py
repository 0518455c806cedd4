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
    depths: np.ndarray | None = None  # (N, H, W) optional depth in NGP units (0 = none)
    sharpness: np.ndarray | None = None
    n_extra_learnable_dims: int = 0
    paths: list = field(default_factory=list)
    # rolling shutter / motion blur (nerf_loader.cu:204-215): per-pixel time
    # t = rs[0] + rs[1]*u + rs[2]*v + rs[3]*motionblur, slerped between
    # xforms (start) and xforms_end
    rolling_shutter: np.ndarray = field(default_factory=lambda: np.zeros(4, np.float32))
    xforms_end: np.ndarray | None = None  # (N, 3, 4); None => static (== xforms)
    has_masks: bool = False  # any dynamic_mask_* pixels (marked rgb=-1)
    # lat-long environment map: initial values for the trainable background
    # (nerf_loader.h:67-74 envmap_data/envmap_resolution; transforms.json
    # key "envmap" = image path)
    envmap: np.ndarray | None = None  # (He, We, 4) float32 linear
    # per-image light directions in NGP axis order (nerf_loader.cu:667-676
    # "driver_parameters" LightX/Y/Z): FIXED per-image conditioning fed to
    # the color MLP as the first 3 extra dims (not optimized)
    light_dirs: np.ndarray | None = None  # (N, 3) unit vectors

    @property
    def n_images(self) -> int:
        return self.images.shape[0]

    @property
    def n_extra_dims(self) -> int:
        # nerf_loader.h:85-87: light dirs occupy 3 fixed dims; learnable
        # latent-appearance codes add n_extra_learnable_dims more
        return (3 if self.light_dirs is not None else 0) + self.n_extra_learnable_dims


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

    white_transparent = bool(meta.get("white_transparent", False))
    black_transparent = bool(meta.get("black_transparent", False))
    # depth images are uint16 scaled by integer_depth_scale (nerfcapture
    # manifests; nerf_loader.cu:598-607 copy_depth)
    integer_depth_scale = float(meta.get("integer_depth_scale", 1.0 / 65535.0))
    enable_depth = bool(meta.get("enable_depth_loading", True))

    def load_one(fr):
        p = _resolve_image_path(base, fr["file_path"])
        if p is None:
            return None
        # NeRF default trains in sRGB: keep LDR pixels as-stored (sRGB),
        # HDR EXR stays linear.
        img = load_image(p, as_float_linear=(p.suffix.lower() == ".exr"))
        if downscale > 1:
            img = img[::downscale, ::downscale]
        # NSVF 'white = transparent' / black variant (nerf_loader.cu:48-56)
        if white_transparent or black_transparent:
            rgb = img[..., :3]
            if white_transparent:
                img[..., 3] = np.where((rgb >= 254.5 / 255.0).all(-1), 0.0, img[..., 3])
            if black_transparent:
                img[..., 3] = np.where((rgb <= 0.5 / 255.0).all(-1), 0.0, img[..., 3])
        # dynamic masks: negative rgb marks masked-away pixels, which
        # training skips (nerf_loader.cu:596-612, testbed_nerf.cu:776-780)
        mask_p = p.parent / f"dynamic_mask_{p.stem}.png"
        if mask_p.exists():
            mask = load_image(mask_p, as_float_linear=False)[::downscale, ::downscale]
            masked = mask[..., 0] > 0.5
            img[..., :3] = np.where(masked[..., None], -1.0, img[..., :3])
            img[..., 3] = np.where(masked, 0.0, img[..., 3])
        depth = None
        if enable_depth and fr.get("depth_path"):
            dp = base / fr["depth_path"]
            if dp.exists():
                import cv2

                d = cv2.imread(str(dp), cv2.IMREAD_UNCHANGED)
                if d is not None:
                    if d.ndim == 3:
                        d = d[..., 0]
                    # NGP units: u16 * integer_depth_scale (meters) * scene scale
                    depth = d.astype(np.float32)[::downscale, ::downscale]
                    depth *= integer_depth_scale * scale
        return p, img, depth

    with futures.ThreadPoolExecutor(max_workers=16) as ex:
        loaded = list(ex.map(load_one, frames))

    kept = [(fr, pl) for fr, pl in zip(frames, loaded) if pl is not None]
    if not kept:
        raise FileNotFoundError(f"no images found for {path}")
    frames = [fr for fr, _ in kept]
    paths = [pl[0] for _, pl in kept]
    imgs = [pl[1] for _, pl in kept]
    depth_imgs = [pl[2] for _, pl in kept]
    h = max(im.shape[0] for im in imgs)
    w = max(im.shape[1] for im in imgs)
    images = np.zeros((len(imgs), h, w, 4), np.float32)
    for i, im in enumerate(imgs):
        images[i, : im.shape[0], : im.shape[1]] = im
    depths = None
    if any(d is not None for d in depth_imgs):
        depths = np.zeros((len(imgs), h, w), np.float32)
        for i, d in enumerate(depth_imgs):
            if d is not None:
                depths[i, : d.shape[0], : d.shape[1]] = d

    is_hdr = paths[0].suffix.lower() == ".exr"
    has_masks = bool((images[..., :3] < 0).any())

    def focal_from(meta_or_frame, axis, res, other_res, other_angle_key):
        fl_key = "fl_x" if axis == 0 else "fl_y"
        angle_key = "camera_angle_x" if axis == 0 else "camera_angle_y"
        if fl_key in meta_or_frame:
            return float(meta_or_frame[fl_key]) / downscale
        if angle_key in meta_or_frame:
            return 0.5 * res / math.tan(0.5 * float(meta_or_frame[angle_key]))
        return None

    xforms = np.zeros((len(frames), 3, 4), np.float32)
    xforms_end = np.zeros((len(frames), 3, 4), np.float32)
    light_dirs = np.zeros((len(frames), 3), np.float32)
    has_light_dirs = False
    any_end = False
    fls = np.zeros((len(frames), 2), np.float32)
    pps = np.zeros((len(frames), 2), np.float32)
    sharp = np.zeros((len(frames),), np.float32)
    for i, fr in enumerate(frames):
        src = {**meta, **fr}
        # rolling-shutter datasets carry start/end matrices per frame
        # (nerf_loader.cu:515-516)
        m_start = np.asarray(
            fr.get("transform_matrix_start", fr["transform_matrix"]), np.float32
        )
        m_end = fr.get("transform_matrix_end")
        any_end = any_end or m_end is not None
        xforms[i] = nerf_matrix_to_ngp(m_start, scale, offset)
        xforms_end[i] = nerf_matrix_to_ngp(
            np.asarray(m_end, np.float32) if m_end is not None else m_start, scale, offset
        )
        if "driver_parameters" in fr:
            # fixed per-image light direction (nerf_loader.cu:667-676):
            # normalize then cycle axes nerf->ngp (xyz -> yzx)
            dp_ = fr["driver_parameters"]
            ld = np.asarray(
                [float(dp_.get("LightX", 0.0)), float(dp_.get("LightY", 0.0)),
                 float(dp_.get("LightZ", 0.0))], np.float32,
            )
            nrm = np.linalg.norm(ld)
            if nrm > 0:
                ld = ld / nrm
                light_dirs[i] = ld[[1, 2, 0]]
                has_light_dirs = True
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
    rs = np.zeros(4, np.float32)
    if "rolling_shutter" in meta:
        v = list(map(float, meta["rolling_shutter"]))
        rs[: min(len(v), 4)] = v[:4]

    envmap = None
    if "envmap" in meta:
        # initial values for the trainable envmap background
        # (nerf_loader.cu:531-543)
        ep = _resolve_image_path(base, str(meta["envmap"]))
        if ep is not None:
            # the envmap field contract is LINEAR radiance: EXR is linear as
            # stored (the flag is a no-op there) and LDR bytes must be
            # sRGB->linear converted (reference envmap load srgb_to_linear,
            # nerf_loader.cu:531-543)
            envmap = np.asarray(load_image(ep, as_float_linear=True), np.float32)

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
        depths=depths,
        sharpness=sharp,
        # light-dir datasets force the learnable count to 0
        # (nerf_loader.cu:675-676)
        n_extra_learnable_dims=0 if has_light_dirs
        else int(meta.get("n_extra_learnable_dims", 0)),
        paths=paths,
        rolling_shutter=rs,
        xforms_end=xforms_end if (any_end or rs.any()) else None,
        has_masks=has_masks,
        envmap=envmap,
        light_dirs=light_dirs if has_light_dirs else None,
    )

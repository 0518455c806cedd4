"""Generate a lego-class synthetic NeRF benchmark dataset by path-tracing a
reference mesh with the geometry engine's BVH renderer.

The reference tree ships no nerf_synthetic scene, so the novel-view
protocol (reference scripts/run.py:210-268: every test view, full res,
spp 8, black background) needs ground truth we can regenerate exactly.
This renders the bunny/armadillo mesh (Disney BRDF + sun + shadow rays +
sky ambient — an entirely independent renderer from the NeRF path) from
known cameras and writes a transforms_train/test.json pair in the standard
blender-NeRF convention that `io/nerf_dataset.py` ingests.

GT honesty: 2x supersampled (box-filtered in linear RGB), alpha from hit
coverage, colors stored as sRGB PNG — identical conventions to what the
NeRF trains and evals in.

Usage: python tools/make_synthetic_nerf.py out_dir [--mesh bunny.obj]
       [--res 800] [--n_train 100] [--n_test 25] [--ssaa 2]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SDF_DATA = Path("/root/reference/data/sdf")


def fibonacci_hemisphere(n, r, center, y_min=0.05, y_max=0.85):
    """n points on the upper hemisphere (blender-synthetic style orbits)."""
    i = np.arange(n, dtype=np.float64)
    golden = (1 + 5**0.5) / 2
    y = y_min + (y_max - y_min) * (i + 0.5) / n  # elevation sweep
    theta = 2 * np.pi * i / golden
    xz = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    pts = np.stack([xz * np.cos(theta), y, xz * np.sin(theta)], axis=-1)
    return center + r * pts.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--mesh", default=str(SDF_DATA / "bunny.obj"))
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--n_train", type=int, default=100)
    ap.add_argument("--n_test", type=int, default=25)
    ap.add_argument("--ssaa", type=int, default=2)
    ap.add_argument("--radius", type=float, default=1.05)
    ap.add_argument("--camera_angle_x", type=float, default=0.6911112)
    args = ap.parse_args()

    import jax.numpy as jnp

    from sienerf_tpu.engines.geometry import GeometryEngine, GeometryObject
    from sienerf_tpu.geom.bvh import build_bvh
    from sienerf_tpu.geom.mesh_io import load_mesh, normalize_to_unit_cube, triangle_normals
    from sienerf_tpu.io.image_io import save_image
    from sienerf_tpu.io.nerf_dataset import ngp_matrix_to_nerf
    from sienerf_tpu.common import NERF_SCALE
    from sienerf_tpu.ops.brdf import BRDFParams
    from sienerf_tpu.utils.bbox import BoundingBox
    from sienerf_tpu.utils.camera import look_at_matrix, uv_to_ray

    out = Path(args.out_dir)
    (out / "train").mkdir(parents=True, exist_ok=True)
    (out / "test").mkdir(parents=True, exist_ok=True)

    tri = normalize_to_unit_cube(load_mesh(args.mesh)).astype(np.float32)
    bvh = build_bvh(tri)
    eng = GeometryEngine(
        objects=[GeometryObject("mesh", np.zeros(3, np.float32), args.mesh,
                                (0, len(tri)))],
        bvh_dev=bvh.as_device_arrays(),
        tri_normals=jnp.asarray(triangle_normals(bvh.triangles)),
        tri_obj_id=jnp.zeros((len(tri),), jnp.int32),
        aabb=BoundingBox.unit(),
        brdf=BRDFParams(basecolor=(0.82, 0.55, 0.28), roughness=0.55,
                        specular=0.6, clearcoat=0.3),
    )

    center = np.full(3, 0.5, np.float32)
    R = args.res * args.ssaa
    fl = R / (2.0 * np.tan(args.camera_angle_x / 2.0))
    n_pix = R * R
    tile = 1 << 16
    n_pad = ((n_pix + tile - 1) // tile) * tile
    idx = np.arange(n_pad)
    px = (idx % R).astype(np.float32)
    py = np.minimum(idx // R, R - 1).astype(np.float32)
    uv = jnp.asarray(np.stack([(px + 0.5) / R, (py + 0.5) / R], axis=-1))

    def render_view(cam):
        o, d = uv_to_ray(uv, (R, R), (fl, fl), jnp.asarray(cam, jnp.float32))
        rgb = np.zeros((n_pad, 3), np.float32)
        a = np.zeros((n_pad,), np.float32)
        for i in range(0, n_pad, tile):
            c, _, hit = eng.render_mesh_rays(o[i : i + tile], d[i : i + tile])
            hitf = np.asarray(hit, np.float32)
            rgb[i : i + tile] = np.asarray(c) * hitf[:, None]
            a[i : i + tile] = hitf
        img = np.concatenate([rgb, a[:, None]], axis=-1)[:n_pix].reshape(R, R, 4)
        if args.ssaa > 1:
            s = args.ssaa
            img = img.reshape(args.res, s, args.res, s, 4).mean(axis=(1, 3))
            # un-premultiply after the box filter (coverage-weighted color)
            al = np.maximum(img[..., 3:4], 1e-6)
            img = np.concatenate([img[..., :3] / al, img[..., 3:4]], axis=-1)
            img[..., :3] *= (img[..., 3:4] > 1e-5)
        return img

    rng = np.random.default_rng(7)
    splits = {
        "train": fibonacci_hemisphere(args.n_train, args.radius, center),
        "test": fibonacci_hemisphere(args.n_test, args.radius, center,
                                     y_min=0.12, y_max=0.75)
        + rng.normal(0, 0.01, (args.n_test, 3)).astype(np.float32),
    }
    for split, eyes in splits.items():
        frames = []
        for vi, eye in enumerate(eyes):
            cam = look_at_matrix(eye, center)
            img = render_view(cam)
            name = f"{split}/r_{vi}"
            save_image(out / f"{name}.png", img, input_is_linear=True)
            m = np.eye(4, dtype=np.float64)
            m[:3] = ngp_matrix_to_nerf(cam, NERF_SCALE, center)
            frames.append({"file_path": f"./{name}",
                           "transform_matrix": m.tolist()})
            print(f"{name}: coverage={float(img[..., 3].mean()):.3f}", flush=True)
        meta = {"camera_angle_x": args.camera_angle_x, "aabb_scale": 1,
                "frames": frames}
        (out / f"transforms_{split}.json").write_text(json.dumps(meta, indent=1))
    print(f"wrote {args.n_train}+{args.n_test} views @ {args.res}px to {out}")


if __name__ == "__main__":
    main()

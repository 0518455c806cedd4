"""Surface-irradiance demo — the fork's research goal, end to end, from the
committed render snapshot (fresh-box runnable).

The reference DECLARED this pipeline but never implemented it:
computeEnvmapGrid + ShadeGridEnvMap (testbed.h:709-743, main.cu:184-188,
enum common.h:58-72) were unresolved symbols.  Here: a grid of spherical
probes is baked by rendering the fox NeRF from inside the scene
(engines/irradiance.py, spherical initializers spec testbed_nerf.cu:
1559-1773), projected to SH9, and the bunny's Disney-BRDF ambient term
samples the probe grid per shading point — versus the constant
`ambientcolor` the reference shipped (testbed_geometry_training.cu:
101-106).

Outputs: examples/out/irradiance_ambient.png (constant ambient),
examples/out/irradiance_probegrid.png (NeRF-lit), plus timings on stdout.

Usage: python examples/irradiance_demo.py [W H]  (default 960x540)
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from sienerf_tpu.engines import irradiance as irr  # noqa: E402
from sienerf_tpu.engines.geometry import GeometryEngine, GeometryObject  # noqa: E402
from sienerf_tpu.engines.nerf import NerfEngine  # noqa: E402
from sienerf_tpu.io.image_io import save_image  # noqa: E402
from sienerf_tpu.io.nerf_dataset import load_nerf_dataset  # noqa: E402
from sienerf_tpu.io.snapshot import load_render_snapshot  # noqa: E402
from sienerf_tpu.utils.camera import look_at_matrix  # noqa: E402
from sienerf_tpu.utils.config import load_network_config  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "examples" / "out"


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 540

    ds = load_nerf_dataset("/root/reference/data/nerf/fox", downscale=4,
                           max_images=24)
    cfg = load_network_config("/root/reference/configs/nerf/base.json")
    eng = NerfEngine.create(cfg, ds, train_batch_size=1 << 18)
    params, bf, meta = load_render_snapshot(REPO / "data" / "fox_render.snap")
    eng._phase = meta.get("phase", "fast")
    state = {"opt": {}, "params": params, "occ": {"bitfield": bf}}
    print(f"# fox field at step {meta['step']}")

    cam_pos0 = np.asarray(eng.xforms[2][:, 3])
    target0 = np.array([0.7, 0.45, 0.55])
    bunny_at = cam_pos0 + 0.3 * (target0 - cam_pos0)
    scene = {"geometry": [
        {"center": (bunny_at - 0.5).tolist(), "scale": 0.3,
         "path": "/root/reference/data/geometry/objs/bunny.obj",
         "type": "Mesh"},
    ]}
    sp = pathlib.Path("/tmp/irr_demo_scene.json")
    sp.write_text(json.dumps(scene))

    geo = GeometryEngine.load_scene(sp)
    geo.objects.append(GeometryObject(
        "nerf", np.zeros(3, np.float32), "fox", nerf=eng, nerf_state=state))
    from dataclasses import replace

    geo.brdf = replace(geo.brdf, basecolor=(0.75, 0.72, 0.68),
                       ambientcolor=(1.0, 1.0, 1.0))
    cam = look_at_matrix(np.asarray(cam_pos0, np.float32),
                         np.asarray(target0, np.float32))
    fl = (420.0 * W / 480.0, 420.0 * W / 480.0)
    OUT.mkdir(exist_ok=True)

    # --- constant-ambient render (what the reference shipped)
    geo.shade_mode = "constant"
    rgba_a, _ = geo.render_frame(W, H, cam, fl, background=(0.0, 0.0, 0.0),
                                 tile=1 << 14, renderer="baked")  # warm
    t0 = time.time()
    rgba_a, _ = geo.render_frame(W, H, cam, fl, background=(0.0, 0.0, 0.0),
                                 tile=1 << 14, renderer="baked")
    t_a = time.time() - t0
    save_image(OUT / "irradiance_ambient.png", rgba_a)
    print(f"constant-ambient frame: {t_a * 1e3:.0f} ms")

    # --- probe-grid bake (computeEnvmapGrid equivalent) + NeRF-lit render
    t0 = time.time()
    grid = irr.bake_probe_grid(eng, state, [0.3, 0.2, 0.2], [1.2, 0.9, 0.9],
                               grid_size=3, env_width=32, env_height=16)
    t_bake = time.time() - t0
    print(f"27-probe SH9 grid bake: {t_bake:.1f} s "
          f"(coeff range {float(jnp.asarray(grid['coeffs']).min()):.3f}.."
          f"{float(jnp.asarray(grid['coeffs']).max()):.3f})")
    geo.probe_grid = grid
    geo.shade_mode = "grid"
    rgba_g, _ = geo.render_frame(W, H, cam, fl, background=(0.0, 0.0, 0.0),
                                 tile=1 << 14, renderer="baked")  # warm
    t0 = time.time()
    rgba_g, _ = geo.render_frame(W, H, cam, fl, background=(0.0, 0.0, 0.0),
                                 tile=1 << 14, renderer="baked")
    t_g = time.time() - t0
    save_image(OUT / "irradiance_probegrid.png", rgba_g)
    print(f"probe-grid (ShadeGridEnvMap) frame: {t_g * 1e3:.0f} ms")

    diff = float(np.abs(np.asarray(rgba_g[..., :3]) -
                        np.asarray(rgba_a[..., :3])).mean())
    print(json.dumps({
        "metric": "irradiance_demo", "w": W, "h": H,
        "ambient_ms": round(t_a * 1e3, 1), "probegrid_ms": round(t_g * 1e3, 1),
        "probe_bake_s": round(t_bake, 1), "mean_abs_shading_delta": round(diff, 4),
    }))


if __name__ == "__main__":
    main()

"""Time the jitted hybrid geometry frame + batched probe bake on real TPU.

VERDICT.md Next #5 acceptance: 720p-class hybrid frame and 27-probe bake
each >=5x faster than the round-1 eager numbers (77 s bake, 27 s 480x360
frame, /tmp/hybridA.log).  Uses the cached fox field (FOX_CACHE) so engine
geometry always matches.

Usage: FOX_CACHE=fox_4k.pkl python tools/bench_hybrid.py [W] [H]
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402


def main():
    import jax.numpy as jnp

    from sienerf_tpu.engines import irradiance as irr
    from sienerf_tpu.engines.geometry import GeometryEngine, GeometryObject
    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
    from sienerf_tpu.utils.camera import look_at_matrix

    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1280
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 720

    eng, state = get_state()

    cam_pos0 = np.asarray(
        load_nerf_dataset("/root/reference/data/nerf/fox", downscale=8, max_images=3).xforms[2][:, 3]
    )
    target0 = np.array([0.7, 0.45, 0.55])
    bunny_at = cam_pos0 + 0.3 * (target0 - cam_pos0)
    scene = {"geometry": [
        {"center": (bunny_at - 0.5).tolist(), "scale": 0.3,
         "path": "/root/reference/data/geometry/objs/bunny.obj", "type": "Mesh"},
    ]}
    p = pathlib.Path("/tmp/hybrid_scene.json")
    p.write_text(json.dumps(scene))
    geo = GeometryEngine.load_scene(p)
    geo.objects.append(
        GeometryObject("nerf", np.zeros(3, np.float32), "fox", nerf=eng, nerf_state=state)
    )

    t0 = time.time()
    grid = irr.bake_probe_grid(
        eng, state, [0.3, 0.2, 0.2], [1.2, 0.9, 0.9],
        grid_size=3, env_width=32, env_height=16,
    )
    cmin = float(jnp.asarray(grid["coeffs"]).min())
    print(f"27-probe bake: {time.time()-t0:.1f}s (coeff min {cmin:.3f})", flush=True)
    geo.probe_grid = grid
    geo.shade_mode = "grid"

    cam = look_at_matrix(np.asarray(cam_pos0, np.float32), np.asarray(target0, np.float32))
    fl = (420.0 * W / 480.0, 420.0 * W / 480.0)

    # mesh pass alone (primary + shadow BVH traversal, no NeRF): separates
    # a BVH-bound frame from a NeRF-bound one
    from sienerf_tpu.utils.camera import uv_to_ray

    idx = jnp.arange(W * H)
    uv = jnp.stack([((idx % W).astype(jnp.float32) + 0.5) / W,
                    ((idx // W).astype(jnp.float32) + 0.5) / H], axis=-1)
    o_all, d_all = uv_to_ray(uv, (W, H), jnp.asarray(fl, jnp.float32),
                             jnp.asarray(cam, jnp.float32))
    mrgb, mdepth, mhit = geo.render_mesh_rays(o_all, d_all)
    float(jnp.asarray(mdepth[0]))
    t0 = time.time()
    mrgb, mdepth, mhit = geo.render_mesh_rays(o_all, d_all)
    float(jnp.asarray(mdepth[0]))
    print(f"mesh pass alone: {(time.time()-t0)*1e3:.0f} ms "
          f"(hit {float(jnp.asarray(mhit).mean()):.3f})", flush=True)

    for renderer in ("baked", "live"):
        def frame():
            return geo.render_frame(
                W, H, cam, fl, background=(0.0, 0.0, 0.0), tile=1 << 14,
                renderer=renderer,
            )

        t0 = time.time()
        rgba, depth = frame()
        a = float(jnp.asarray(rgba[..., 3]).mean())  # compile(+bake)+sync
        print(f"hybrid {renderer} warmup (compile+bake): {time.time()-t0:.1f}s",
              flush=True)
        t0 = time.time()
        rgba, depth = frame()
        float(jnp.asarray(rgba[0, 0, 0]))
        dt = time.time() - t0
        print(f"hybrid {W}x{H} frame ({renderer}): {dt*1e3:.0f} ms "
              f"({W*H/dt/1e6:.2f} Mrays/s), alpha mean {a:.3f}", flush=True)


if __name__ == "__main__":
    main()

import sys
SNAPSHOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fox_2k_b.ingp"
"""End-to-end demo of the fork's signature pipeline on TPU:
fox NeRF (trained snapshot) + bunny mesh in one scene, shadow rays,
NeRF-probe irradiance grid feeding the BRDF ambient term."""
import json, pathlib, time
import jax, jax.numpy as jnp, numpy as np
from sienerf_tpu.engines.nerf import NerfEngine
from sienerf_tpu.engines.geometry import GeometryEngine, GeometryObject
from sienerf_tpu.engines import irradiance as irr
from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
from sienerf_tpu.io.snapshot import load_snapshot
from sienerf_tpu.io.image_io import save_image
from sienerf_tpu.utils.config import load_network_config
from sienerf_tpu.utils.camera import look_at_matrix

ds = load_nerf_dataset("/root/reference/data/nerf/fox", downscale=4)
# must match the config the snapshot was trained with
cfg = load_network_config("/root/reference/configs/nerf/base.json")
eng = NerfEngine.create(cfg, ds, train_batch_size=1<<18)
eng.near_distance = 0.2  # match snapshot
state = jax.tree.map(jnp.asarray, load_snapshot(SNAPSHOT)["state"])

cam_pos0 = np.asarray(load_nerf_dataset("/root/reference/data/nerf/fox", downscale=8, max_images=3).xforms[2][:, 3])
target0 = np.array([0.7, 0.45, 0.55])
bunny_at = cam_pos0 + 0.3 * (target0 - cam_pos0)  # in the empty corridor
print("bunny at", bunny_at)
scene = {"geometry": [
    {"center": (bunny_at - 0.5).tolist(), "scale": 0.3, "path": "/root/reference/data/geometry/objs/bunny.obj", "type": "Mesh"},
]}
p = pathlib.Path("/tmp/hybrid_scene.json"); p.write_text(json.dumps(scene))
geo = GeometryEngine.load_scene(p)
geo.objects.append(GeometryObject("nerf", np.zeros(3, np.float32), "fox", nerf=eng, nerf_state=state))

t0 = time.time()
print("baking irradiance probe grid from the fox NeRF...", flush=True)
grid = irr.bake_probe_grid(eng, state, [0.3, 0.2, 0.2], [1.2, 0.9, 0.9], grid_size=3, env_width=32, env_height=16)
print(f"baked 27 probes in {time.time()-t0:.0f}s; coeff range {float(grid['coeffs'].min()):.3f}..{float(grid['coeffs'].max()):.3f}", flush=True)
geo.probe_grid = grid
geo.shade_mode = "grid"
from dataclasses import replace
geo.brdf = replace(geo.brdf, basecolor=(0.75, 0.72, 0.68), ambientcolor=(1.0, 1.0, 1.0))

cam_pos = np.asarray(ds.xforms[2][:, 3])
cam = look_at_matrix(cam_pos, [0.7, 0.45, 0.55])
t0 = time.time()
rgba, depth = geo.render_frame(480, 360, cam, (420.0, 420.0), background=(0.0, 0.0, 0.0), tile=1<<14)
print(f"hybrid 480x360 frame in {time.time()-t0:.1f}s; alpha mean {rgba[...,3].mean():.3f}", flush=True)
save_image("/tmp/hybrid_demo.png", rgba)
mesh_hit = np.isfinite(depth) & (rgba[...,3] > 0.99)
print("saved /tmp/hybrid_demo.png")

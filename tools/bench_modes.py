"""Perf + quality snapshot for the image / SDF / volume modes on TPU.

VERDICT r3 next #7: all three modes were correctness-tested at toy sizes
only; this records train steps/s and render rays/s at standard sizes plus
each mode's oracle — image PSNR vs albert.exr (reference
testbed_image.cu:455-518), SDF IoU@128^3 vs the BVH ground truth
(testbed_sdf.cu:1370), volume PSNR vs the delta-tracked GT render
(testbed_volume.cu:280 GT toggle).

Timing rules (NOTES_ROUND3): loop-amortized, inputs varied per iteration,
one device->host fetch per measurement (every fetch pays a ~25 ms tunnel
RTT on this box).

Usage: python tools/bench_modes.py [image|sdf|volume|all]
"""

import json
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sienerf_tpu.utils.config import load_network_config  # noqa: E402

REF = Path("/root/reference")


def timed_loop(step_fn, carry, n, probe, *extras):
    """Run step_fn n times inside ONE jit (fori_loop), return s/iter.
    `probe(carry) -> scalar` forces the single fetch.  Big device arrays
    the step needs must ride in `extras` (jit ARGS) — closure-captured
    device arrays become MLIR constants and exhaust the tunnel backend
    (measured: the 95 MB albert image killed this tool's first run)."""

    @jax.jit
    def run(c, key, *ex):
        def body(i, c):
            return step_fn(c, jax.random.fold_in(key, i), *ex)

        return jax.lax.fori_loop(0, n, body, c)

    out = run(carry, jax.random.PRNGKey(0), *extras)
    float(probe(out))  # compile + warm
    t0 = time.time()
    out = run(carry, jax.random.PRNGKey(1), *extras)
    float(probe(out))
    return (time.time() - t0) / n, out


def bench_image():
    from sienerf_tpu.engines.image import ImageEngine
    from sienerf_tpu.io.image_io import load_image

    img = load_image(REF / "data" / "image" / "albert.exr")
    cfg = load_network_config(REF / "configs" / "image" / "base.json")
    # chip-memory cap (documented): the reference albert config asks for
    # 2^24 rows; our CELL layout carries 2^D*F floats per row, so the f32
    # master + 2 Adam moments at 2^24 is ~26 GB — over the 16 GB chip no
    # matter the graph.  2^22 rows = the same parameter budget as a
    # corner-layout 2^24 table (~2.1 GB master, 6.4 GB with moments) and
    # fits with the round-5 flat boundary layout (the (L,T,4,2) tile-pad
    # copy that killed 2^21 in r4 is gone — ops/hashgrid.py flat tables).
    cfg["encoding"]["log2_hashmap_size"] = min(
        int(os.environ.get("IMG_LOG2_T", "22")),
        cfg["encoding"].get("log2_hashmap_size", 24))
    # batch 2^16: the image config's 2^24-entry grid at batch 2^18 in a
    # 64-step fused loop OOMs the 16 GB chip (20 GB of HLO temps, 69%
    # fragmentation — measured)
    eng = ImageEngine.create(cfg, img, batch_size=1 << 16)
    params, opt = eng.init()

    def step(c, key, image):
        p, o = c
        p, o, _ = eng._train_step_jit(p, o, key, image)
        return (p, o)

    # NOTE: donate_argnums on the inner jit is ignored when inlined — fine.
    dt, (params, opt) = timed_loop(
        step, (params, opt), 64,
        lambda c: jax.tree.leaves(c[0])[0].reshape(-1)[0],
        eng.image,
    )
    h, w = img.shape[:2]
    t0 = time.time()
    n_r = 4
    for i in range(n_r):
        out = eng.render(params, opt, w, h)
    float(out.reshape(-1)[0])
    dt_r = (time.time() - t0) / n_r
    psnr = eng.psnr(params, opt)
    return {
        "mode": "image", "res": [h, w], "batch": 1 << 16,
        "train_steps_per_s": round(1.0 / dt, 1),
        "train_samples_per_s": round((1 << 16) / dt / 1e6, 1),
        "render_mpix_per_s": round(h * w / dt_r / 1e6, 2),
        "psnr_vs_gt_after_64_steps_plus": round(psnr, 2),
    }


def bench_sdf():
    from sienerf_tpu.engines.sdf import SdfEngine
    from sienerf_tpu.geom.mesh_io import load_obj, normalize_to_unit_cube

    tri = normalize_to_unit_cube(load_obj(REF / "data" / "sdf" / "bunny.obj"))
    cfg = load_network_config(REF / "configs" / "sdf" / "base.json")
    eng = SdfEngine.create(cfg, tri, batch_size=1 << 16)
    state = eng.init()

    # train: bundles of 16 steps (the engine's own amortized unit)
    t0 = time.time()
    n_b = 8
    key = jax.random.PRNGKey(0)
    for i in range(n_b):
        key, sub = jax.random.split(key)
        state, loss = eng.train_bundle(state, sub, n_steps=16)
    float(jnp.asarray(loss))
    dt = (time.time() - t0) / (n_b * 16)
    # longer train for the oracle (reference trains SDF in seconds)
    for i in range(56):
        key, sub = jax.random.split(key)
        state, loss = eng.train_bundle(state, sub, n_steps=16)
    iou = eng.calculate_iou(state, resolution=128)

    from sienerf_tpu.utils.camera import look_at_matrix

    cam = look_at_matrix(np.array([0.5, 0.6, 1.6], np.float32),
                         np.array([0.5, 0.5, 0.5], np.float32))
    W = H = 800
    params = state["params"]
    t0 = time.time()
    rgba, depth = eng.render_frame(params, state["opt"], W, H, cam)
    np.asarray(depth[0, 0])
    t0 = time.time()
    rgba, depth = eng.render_frame(params, state["opt"], W, H, cam)
    np.asarray(depth[0, 0])
    dt_r = time.time() - t0
    return {
        "mode": "sdf", "mesh": "bunny", "batch": 1 << 16,
        "train_steps_per_s": round(1.0 / dt, 1),
        "train_samples_per_s_M": round((1 << 16) / dt / 1e6, 1),
        "render_mrays_per_s_800p": round(W * H / dt_r / 1e6, 3),
        "iou_128_after_1024_steps": round(float(iou), 4),
    }


def bench_volume():
    from sienerf_tpu.engines.volume import VolumeEngine
    from sienerf_tpu.io.nanovdb import synthetic_fog_volume

    vol = synthetic_fog_volume(64, "sphere")
    cfg = load_network_config(REF / "configs" / "volume" / "base.json")
    eng = VolumeEngine.create(cfg, vol, batch_size=1 << 16)
    state = eng.init()
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    n_b = 8
    for i in range(n_b):
        key, sub = jax.random.split(key)
        state, loss = eng.train_bundle(state, sub, n_steps=16)
    float(jnp.asarray(loss))
    dt = (time.time() - t0) / (n_b * 16)
    for i in range(24):
        key, sub = jax.random.split(key)
        state, loss = eng.train_bundle(state, sub, n_steps=16)

    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.utils.camera import look_at_matrix

    params = inference_params(state["opt"], state["params"])
    cam = look_at_matrix(np.array([0.5, 0.5, 2.2], np.float32),
                         np.array([0.5, 0.5, 0.5], np.float32))
    W = H = 512
    fl = (W * 1.2, W * 1.2)
    t0 = time.time()
    rgb, a = eng.render_frame(params, W, H, cam, fl, spp=4)
    dt_r = time.time() - t0  # render_frame returns numpy (already synced)
    rgb_gt, _ = eng.render_frame(params, W, H, cam, fl, spp=8, use_gt=True)
    mse = float(np.mean((rgb - rgb_gt) ** 2))
    return {
        "mode": "volume", "grid": 64, "batch": 1 << 16,
        "train_steps_per_s": round(1.0 / dt, 1),
        "render_mrays_per_s_512p_spp4": round(W * H * 4 / dt_r / 1e6, 3),
        "psnr_vs_gt_render": round(-10 * np.log10(max(mse, 1e-10)), 2),
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rows = []
    for name, fn in (("image", bench_image), ("sdf", bench_sdf),
                     ("volume", bench_volume)):
        if which not in (name, "all"):
            continue
        t0 = time.time()
        row = fn()
        row["wall_s"] = round(time.time() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

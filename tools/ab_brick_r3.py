"""Round-3 decision A/B: post-precision-fix brick-vs-row quality AND speed.

For each (cull, fine) combo at the v6-winner base config: 720p frame time
and 360p PSNR vs the live renderer; plus a max_rounds ladder on brick/brick
to separate march-budget truncation (legit knob) from any residual
correctness gap.  Usage: python tools/ab_brick_r3.py [max_rounds...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import pickle

    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.utils.config import load_network_config

    cache = next(
        (p for p in (Path(".cache/fox_16k.pkl"), Path(".cache/fox_4k.pkl")) if p.exists()),
        None,
    )
    assert cache, "need a cached fox field"
    ds = load_nerf_dataset("/root/reference/data/nerf/fox", downscale=4, max_images=24)
    cfg = load_network_config("/root/reference/configs/nerf/base.json")
    eng = NerfEngine.create(cfg, ds, train_batch_size=1 << 18)
    blob = pickle.load(open(cache, "rb"))
    state = jax.tree.map(jnp.asarray, blob["state"])
    eng._phase = blob["phase"]
    params = inference_params(state["opt"], state["params"])
    bf = state["occ"]["bitfield"]
    t0 = time.time()
    grid, meta = eng.bake_features(params, state["occ"], resolution=256, mode="nearest")
    float(np.asarray(grid["rows"][0, 0]))
    print(f"# bake: {time.time() - t0:.1f}s (field: {cache.name}, "
          f"step {int(state['step'])})")

    W, H = 1280, 720
    lw, lh = 640, 360
    fl = tuple(np.asarray(eng.focals[0]) * W / eng.resolution[0])
    fl_s = tuple(np.asarray(eng.focals[0]) * lw / eng.resolution[0])
    cam = eng.xforms[0]
    BASE = dict(candidates=64, evals=16, step_scale=4.0,
                advance_iters=16, init_advance_iters=32)

    t0 = time.time()
    live, _ = eng.render_frame(params, bf, lw, lh, cam, fl_s, tile=1 << 14)
    live = np.asarray(live[..., :3])
    print(f"# live {lw}x{lh}: {time.time() - t0:.1f}s")

    def run(tag, **over):
        kw = dict(BASE)
        kw.update(over)
        img, _ = render_frame_baked(
            eng, params, bf, grid, cam, fl_s, width=lw, height=lh,
            resolution=meta["resolution"], mode=meta["mode"],
            n_cascades=meta["n_cascades"], **kw)
        mse = float(np.mean((live - np.asarray(img[..., :3])) ** 2))
        psnr = -10 * np.log10(max(mse, 1e-12))
        big, _ = render_frame_baked(
            eng, params, bf, grid, cam, fl, width=W, height=H,
            resolution=meta["resolution"], mode=meta["mode"],
            n_cascades=meta["n_cascades"], **kw)
        big.block_until_ready()
        t0 = time.time()
        n = 2
        for _ in range(n):
            big, _ = render_frame_baked(
                eng, params, bf, grid, cam, fl, width=W, height=H,
                resolution=meta["resolution"], mode=meta["mode"],
                n_cascades=meta["n_cascades"], **kw)
        big.block_until_ready()
        ms = (time.time() - t0) / n * 1e3
        print(f"{tag:32s} {ms:8.1f} ms/720p  {psnr:6.2f} dB vs live  "
              f"({W * H / ms * 1e3 / 1e6:.2f} Mrays/s)")

    run("coarse/row (r2 record cfg)", cull="coarse", fine="row")
    run("brick/row", cull="brick", fine="row")
    run("coarse/brick", cull="coarse", fine="brick")
    run("brick/brick", cull="brick", fine="brick")
    for mr in [int(a) for a in sys.argv[1:]] or [48]:
        run(f"brick/brick max_rounds={mr}", cull="brick", fine="brick",
            max_rounds=mr)
        run(f"coarse/row max_rounds={mr}", cull="coarse", fine="row",
            max_rounds=mr)


if __name__ == "__main__":
    main()

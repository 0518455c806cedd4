"""Novel-view parity: live vs baked renderer, each scored against GT.

VERDICT r2 #4's own quality criterion: "baked novel-view PSNR within
0.3 dB of live".  The cross-PSNR gate (baked-vs-live on a train view)
saturates at ~27-29 dB on the sharp fox field no matter what R / step /
bits do (NOTES_ROUND3 gate-zoom section) — consistent with pixel-scale
sampling decorrelation on sub-voxel fur, not bake infidelity.  This script
measures the thing that actually matters: does a user lose quality by
switching to the fast renderer on views the field was NOT fit to?

Usage: FOX_CACHE=fox_16k.pkl [BAKE_R=256] [DS=4] [RENDERER=baked|sweep] \
         python tools/eval_baked_parity.py
(uses .cache/fox_split/transforms_test.json for the held-out views;
RENDERER=sweep scores the slab-sweep renderer instead of the gather one)
"""

import os
import sys
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402


def main():
    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
    from sienerf_tpu.metrics import psnr as psnr_of
    from sienerf_tpu.ops.optim import inference_params

    R = int(os.environ.get("BAKE_R", "256"))
    DS = int(os.environ.get("DS", "4"))
    eng, state = get_state()
    bf = state["occ"]["bitfield"]
    if R == 256:
        from tools.profile_render import get_baked

        grid, meta, params = get_baked(eng, state)
    else:
        params = inference_params(state["opt"], state["params"])
        t0 = time.time()
        grid, meta = eng.bake_features(params, state["occ"], resolution=R,
                                       mode="nearest", row_bits=16)
        float(jnp.asarray(grid["rows"][0, 0]))
        print(f"# bake R={R}: {time.time() - t0:.0f}s")

    test = load_nerf_dataset(Path(".cache/fox_split/transforms_test.json"),
                             downscale=DS)
    cfg = dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
               init_advance_iters=32, cull="brick", fine="row")
    renderer = os.environ.get("RENDERER", "baked")
    if renderer == "sweep":
        from sienerf_tpu.engines.nerf_sweep import render_frame_sweep

        def fast_frame(cam, focal, w, h, sc):
            return render_frame_sweep(
                eng, params, grid, meta, cam, focal, width=w, height=h,
                screen_center=sc, min_transmittance=1e-4,
            )
    else:
        def fast_frame(cam, focal, w, h, sc):
            return render_frame_baked(
                eng, params, bf, grid, cam, focal, width=w, height=h,
                resolution=meta["resolution"], mode=meta["mode"],
                n_cascades=meta["n_cascades"], screen_center=sc,
                min_transmittance=1e-4, **cfg,
            )
    rows = []
    for vi in range(test.n_images):
        gt = test.images[vi]
        h, w = gt.shape[:2]
        cam = test.xforms[vi]
        focal = tuple(np.asarray(test.focal_lengths[vi]))
        sc = tuple(np.asarray(test.principal_points[vi]))
        live, _ = eng.render_frame(params, bf, w, h, cam, focal, tile=1 << 14,
                                   screen_center=sc, min_transmittance=1e-4)
        baked, _ = fast_frame(cam, focal, w, h, sc)
        gt_rgb = gt[..., :3] * gt[..., 3:4]
        pl = psnr_of(np.asarray(live[..., :3], np.float64), gt_rgb)
        pb = psnr_of(np.asarray(baked[..., :3], np.float64), gt_rgb)
        cross = psnr_of(np.asarray(baked[..., :3], np.float64),
                        np.asarray(live[..., :3], np.float64))
        rows.append((pl, pb, cross))
        print(f"view {vi}: live {pl:6.2f}  baked {pb:6.2f}  "
              f"delta {pb - pl:+5.2f}  cross {cross:5.2f}")
    a = np.asarray(rows)
    print(f"MEAN    : live {a[:,0].mean():6.2f}  baked {a[:,1].mean():6.2f}  "
          f"delta {(a[:,1]-a[:,0]).mean():+5.2f}  cross {a[:,2].mean():5.2f}")


if __name__ == "__main__":
    main()

"""Diagnose WHERE the sweep renderer loses dB on a split view.

Renders one held-out view live + sweep (at several margins) + gather-baked,
then reports: full-res PSNR, 2x2-downsampled PSNR (blur recovers dB there),
PSNR on the opaque region vs edges, and opacity-mask agreement.  Saves the
frames to /tmp for eyeballing.

Usage: [VIEW=2] [DS=4] python tools/diag_sweep_view.py
"""

import os
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_baked, get_state  # noqa: E402


def psnr(a, b, mask=None):
    d = (np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2
    if mask is not None:
        d = d[mask]
    return -10.0 * np.log10(max(float(d.mean()), 1e-10))


def down2(x):
    h, w = x.shape[:2]
    return np.asarray(x)[: h // 2 * 2, : w // 2 * 2].reshape(
        h // 2, 2, w // 2, 2, -1).mean((1, 3))


def main():
    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.engines.nerf_sweep import render_frame_sweep
    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset

    VIEW = int(os.environ.get("VIEW", "2"))
    DS = int(os.environ.get("DS", "4"))
    eng, state = get_state()
    bf = state["occ"]["bitfield"]
    grid, meta, params = get_baked(eng, state)

    test = load_nerf_dataset(Path(".cache/fox_split/transforms_test.json"),
                             downscale=DS)
    gt = test.images[VIEW]
    h, w = gt.shape[:2]
    cam = test.xforms[VIEW]
    focal = tuple(np.asarray(test.focal_lengths[VIEW]))
    sc = tuple(np.asarray(test.principal_points[VIEW]))
    gt_rgb = gt[..., :3] * gt[..., 3:4]

    live, _ = eng.render_frame(params, bf, w, h, cam, focal, tile=1 << 14,
                               screen_center=sc, min_transmittance=1e-4)
    live = np.asarray(live)
    np.save(f"/tmp/diag_live_v{VIEW}.npy", live)
    print(f"live    : vs GT {psnr(live[..., :3], gt_rgb):6.2f}  "
          f"(down2 {psnr(down2(live[..., :3]), down2(gt_rgb)):6.2f})")

    cfg = dict(candidates=64, evals=16, step_scale=4.0, advance_iters=16,
               init_advance_iters=32, cull="brick", fine="row")
    bk, _ = render_frame_baked(
        eng, params, bf, grid, cam, focal, width=w, height=h,
        resolution=meta["resolution"], mode=meta["mode"],
        n_cascades=meta["n_cascades"], screen_center=sc,
        min_transmittance=1e-4, **cfg)
    bk = np.asarray(bk)
    np.save(f"/tmp/diag_baked_v{VIEW}.npy", bk)
    print(f"gather  : vs GT {psnr(bk[..., :3], gt_rgb):6.2f}  "
          f"(down2 {psnr(down2(bk[..., :3]), down2(gt_rgb)):6.2f})  "
          f"vs live {psnr(bk[..., :3], live[..., :3]):6.2f}")

    for margin in (1.15, 2.0):
        for interp in ("nearest", "bilinear"):
            sw, _ = render_frame_sweep(
                eng, params, grid, meta, cam, focal, width=w, height=h,
                screen_center=sc, min_transmittance=1e-4, margin=margin,
                interp=interp)
            sw = np.asarray(sw)
            np.save(f"/tmp/diag_sweep_v{VIEW}_{margin}_{interp}.npy", sw)
            mask = np.broadcast_to(live[..., 3:4] > 0.5, live[..., :3].shape)
            print(f"sweep m={margin} {interp:9s}: vs GT "
                  f"{psnr(sw[..., :3], gt_rgb):6.2f}  "
                  f"(down2 {psnr(down2(sw[..., :3]), down2(gt_rgb)):6.2f})  "
                  f"vs live {psnr(sw[..., :3], live[..., :3]):6.2f}  "
                  f"opaque-only vs live "
                  f"{psnr(sw[..., :3], live[..., :3], mask):6.2f}  "
                  f"opmask agree "
                  f"{float(np.mean((sw[..., 3] > 0.5) == (live[..., 3] > 0.5))):.4f}",
                  flush=True)


if __name__ == "__main__":
    main()

"""Diagnose baked-vs-live disagreement on fox: span stats, per-sample field
agreement, round counts, small side-by-side renders.

Usage: FOX_CACHE=fox_4k.pkl python tools/diag_baked.py
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state  # noqa: E402

W, H = 320, 180


def main():
    from sienerf_tpu.engines.nerf_baked import _candidate_chain, render_frame_baked
    from sienerf_tpu.models.nerf_network import (
        apply_density_activation,
        density_raw,
    )
    from sienerf_tpu.ops.baked import baked_features
    from sienerf_tpu.ops.occupancy import occupied_bbox
    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.ops.raymarch import advance_to_occupied, retreat_to_occupied

    eng, state = get_state()
    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]
    grid, meta = eng.bake_features(params, state["occ"], resolution=256, mode="nearest")

    cam = eng.xforms[0]
    focal = tuple(np.asarray(eng.focals[0]) * W / eng.resolution[0])
    sc = tuple(np.asarray(eng.principal_points[0]))
    n = W * H
    cam_spec = (W, H, focal, cam, sc, jnp.asarray([0.5, 0.5], jnp.float32))
    bounds = occupied_bbox(bitfield)
    ids = jnp.arange(n, dtype=jnp.int32)
    o, d, dn, t0, t1 = eng._frame_make_rays(ids, n, cam_spec, bounds)
    t0a = advance_to_occupied(eng.march, bitfield, o, d, t0, t1, eng.init_advance_iters)
    t1a = retreat_to_occupied(eng.march, bitfield, o, d, t0a, t1, eng.init_advance_iters)
    span = np.asarray(t1a - t0a)
    print(f"span: mean={span.mean():.3f} p50={np.percentile(span,50):.3f} "
          f"p90={np.percentile(span,90):.3f} max={span.max():.3f} "
          f"zero_frac={(span<1e-6).mean():.3f}")
    print(f"t0: mean={np.asarray(t0a).mean():.3f}  cone={eng.march.cone_angle}")

    # steps needed per ray under the candidate chain (closed form):
    # uniform regime below t_star = dmin/cone, geometric above
    from sienerf_tpu.common import MIN_CONE_STEPSIZE

    dmin = MIN_CONE_STEPSIZE
    c = eng.march.cone_angle
    t0n, t1n = np.asarray(t0a), np.asarray(t1a)
    if c > 0:
        t_star = dmin / c
        lo = np.minimum(np.maximum(t0n, 1e-6), t_star)
        hi = np.maximum(t1n, lo)
        steps = np.maximum(lo - t0n, 0.0) / dmin + np.log(
            np.maximum(hi, t_star) / np.maximum(lo, 1e-6)
        ) / np.log1p(c)
    else:
        steps = (t1n - t0n) / dmin
    steps = np.where(t1n > t0n + 1e-9, steps, 0.0)
    for P in (64, 128):
        r = np.ceil(steps / P)
        print(f"rounds@P={P}: mean={r.mean():.2f} p90={np.percentile(r,90):.0f} "
              f"max={r.max():.0f}  (cap 24)  steps mean={steps.mean():.0f}")

    # field agreement on real sample positions of center rays
    sel = jnp.asarray(np.argsort(span)[-2000:])  # longest-span rays
    ts, dts, _ = _candidate_chain(t0a[sel], eng.march.cone_angle, 128, 1.0)
    pos = o[sel][:, None, :] + ts[..., None] * d[sel][:, None, :]
    posf = pos.reshape(-1, 3)
    amin = jnp.asarray(eng.aabb.min, jnp.float32)
    adiag = jnp.asarray(eng.aabb.diag, jnp.float32)
    unit = jnp.clip((posf - amin) / adiag, 0.0, 1.0)
    raw_live = density_raw(eng.net, params, unit)
    dens_live = apply_density_activation(raw_live, eng.net.density_activation)
    raw_baked = baked_features(grid["rows"], grid["scale"], meta["resolution"],
                               meta["n_cascades"], meta["mode"], posf)[:, 0]
    dens_baked = apply_density_activation(raw_baked, eng.net.density_activation)
    dl, db = np.asarray(dens_live), np.asarray(dens_baked)
    valid = np.asarray(ts < t1a[sel][:, None]).reshape(-1)
    dl, db = dl[valid], db[valid]
    hot = dl > 1.0
    print(f"samples={dl.size} hot(live dens>1)={hot.mean():.4f}")
    print(f"baked dens on hot: ratio p50={np.percentile(db[hot]/np.maximum(dl[hot],1e-6),50):.3f} "
          f"corr={np.corrcoef(np.log1p(dl[hot]), np.log1p(db[hot]))[0,1]:.3f}")
    sent = db < 1e-30
    print(f"baked sentinel-frac overall={np.mean(db < 1e-30):.3f}  on hot={sent[hot].mean():.3f}")

    # small renders
    t0r = time.time()
    rgba_b, _ = render_frame_baked(
        eng, params, bitfield, grid, cam, focal, width=W, height=H,
        resolution=meta["resolution"], mode=meta["mode"], n_cascades=meta["n_cascades"],
        screen_center=sc,
    )
    print(f"baked {W}x{H}: {time.time()-t0r:.1f}s (incl compile)")
    rgba_l, _ = eng.render_frame(params, bitfield, W, H, cam, focal, screen_center=sc)
    a = np.asarray(rgba_l)[..., :3]
    b = np.asarray(rgba_b)[..., :3]
    mse = float(np.mean((a - b) ** 2))
    print(f"PSNR baked-vs-live: {-10*np.log10(max(mse,1e-10)):.2f} dB")
    import imageio.v2 as iio

    iio.imwrite("/tmp/diag_live.png", (np.clip(a, 0, 1) * 255).astype(np.uint8))
    iio.imwrite("/tmp/diag_baked.png", (np.clip(b, 0, 1) * 255).astype(np.uint8))
    err = np.abs(a - b).mean(-1)
    iio.imwrite("/tmp/diag_err.png", (np.clip(err * 4, 0, 1) * 255).astype(np.uint8))


if __name__ == "__main__":
    main()

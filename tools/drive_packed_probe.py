"""Verify drive + A/B for the packed-occupancy march probes (ops/bits.py).

Renders one live 720p fox frame (march_rays / advance_to_occupied now probe
row-packed occupancy words) and one baked frame at the current best config.
Known-good pre-change numbers (campaign_a.log): live 4996 ms, baked best
3516 ms.
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_render import get_state, timeit  # noqa: E402

W, H = 1280, 720


def main():
    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.ops.optim import inference_params

    eng, state = get_state()
    params = inference_params(state["opt"], state["params"])
    bitfield = state["occ"]["bitfield"]
    cam = eng.xforms[0]
    fl = tuple(np.asarray(eng.focals[0]) * 4.0)  # undo downscale: native focal

    t = timeit(
        lambda: eng.render_frame(params, bitfield, W, H, cam, fl),
        n=3, warmup=1,
    )
    print(f"live 720p: {t*1e3:.0f} ms -> {W*H/t/1e6:.3f} Mrays/s", flush=True)

    grid, meta = eng.bake_features(params, state["occ"], resolution=256, mode="nearest")
    t = timeit(
        lambda: render_frame_baked(
            eng, params, bitfield, grid, cam, fl, width=W, height=H,
            candidates=64, evals=32, step_scale=4.0,
            advance_iters=16, **meta,
        ),
        n=3, warmup=1,
    )
    print(f"baked 720p (P=64 ev=32 ss=4): {t*1e3:.0f} ms -> {W*H/t/1e6:.3f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()

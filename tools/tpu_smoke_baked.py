"""On-TPU smoke gate for the baked renderer's MXU-precision-sensitive paths.

CPU unit tests CANNOT catch the bf16-default-matmul-precision bug class
(the CPU backend ignores the precision hint and computes f32 natively);
this tool runs the integer-routing primitives AND a baked frame on the
REAL backend and checks exactness / PSNR vs the row path.  Run after any
change to ops/bits.py, ops/baked.py, or ops/exact.py:

    python tools/tpu_smoke_baked.py            # primitives only (~1 min)
    python tools/tpu_smoke_baked.py --frame    # + frame A/B (needs a
                                               # .cache/fox_*.pkl field)

Exit code 0 = all exact; nonzero = the TPU corrupted an integer payload
(VERDICT r2 weak #2 regressed).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def check(name, ok):
    print(f"{'PASS' if ok else 'FAIL'}  {name}")
    return bool(ok)


def smoke_primitives() -> bool:
    """Exercise every integer-through-MXU path with payloads far outside
    the bf16-exact range (> 256) on the live backend."""
    from sienerf_tpu.ops.baked import (
        baked_features,
        baked_features_brick,
        compact_candidates,
        compact_candidates_onehot,
        pack_bricks_from_vertices,
    )
    from sienerf_tpu.ops.bits import (
        brick_probe_ids,
        lookup_bits_brick,
        pack_bits_brick,
    )
    from sienerf_tpu.ops.exact import exact_einsum

    all_ok = True
    # 1. exact_einsum with large integer payloads
    ids = jnp.asarray([700001.0, 3.3e6, 257.0, 16777215.0])
    out = jax.jit(lambda: exact_einsum("ij,j->i", jnp.eye(4), ids))()
    all_ok &= check("exact_einsum large ints", np.array_equal(np.asarray(out), np.asarray(ids)))
    # default-precision demonstration (expected to FAIL on TPU — documents
    # why the policy exists; informational, not scored)
    out_d = jax.jit(lambda: jnp.einsum("ij,j->i", jnp.eye(4), ids))()
    print(f"info  default-precision einsum: {np.asarray(out_d).tolist()} "
          f"(exact = {np.asarray(ids).tolist()})")

    # 2. brick cull probe on a coarse-sidecar-sized table (row ids ~5.5e4)
    K, X = 3, 129
    rng = np.random.default_rng(0)
    keep = rng.random(K * X**3) < 0.35
    words = pack_bits_brick(jnp.asarray(keep), (K, X, X, X))
    A, P = 256, 64
    o = rng.uniform(0, X - 1, (A, 1, 3))
    d = rng.normal(size=(A, 1, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = np.clip(o + d * np.arange(P)[None, :, None] * 0.6, 0, X - 1)
    k3 = jnp.asarray(np.round(pts).astype(np.int32))
    casc = jnp.asarray(np.broadcast_to(rng.integers(0, K, (A, 1)), (A, P)), jnp.int32)
    row, off = brick_probe_ids(k3, casc, (K, X, X, X))
    got = np.asarray(jax.jit(lambda: lookup_bits_brick(words, row, off, P))())
    kk = np.asarray(casc)
    p3 = np.asarray(k3)
    want = keep.reshape(K, X, X, X)[kk, p3[..., 0], p3[..., 1], p3[..., 2]]
    all_ok &= check("lookup_bits_brick coarse-sidecar-size", np.array_equal(got, want))

    # 3. fine brick feature gather at R=128 x 3 cascades (row ids ~8e5)
    R, K, F = 128, 3, 16
    Rv = R + 1
    key = jax.random.PRNGKey(1)
    vrows = jax.random.randint(key, (K * Rv**3, F // 4), -(2**31), 2**31 - 1, jnp.int32)
    scale = jnp.full((K, F), 0.02, jnp.float32)
    brows = pack_bricks_from_vertices(vrows, R, K)
    A, E = 512, 16
    o = rng.uniform(-1.2, 1.8, (A, 1, 3))
    d = rng.normal(size=(A, 1, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos = jnp.asarray(o + d * np.arange(E)[None, :, None] * 0.01, jnp.float32)
    fb, ovf = jax.jit(lambda: baked_features_brick(brows, scale, R, K, pos, E))()
    fr = jax.jit(lambda: baked_features(vrows, scale, R, K, "nearest", pos.reshape(-1, 3)))()
    served = ~np.asarray(ovf).reshape(-1)
    eq = np.array_equal(np.asarray(fb).reshape(-1, F)[served], np.asarray(fr)[served])
    all_ok &= check(f"baked_features_brick R={R} ({served.mean():.0%} served)", eq)

    # 4. one-hot compaction exactness (ts floats must pass through intact)
    keepm = jnp.asarray(rng.random((64, 64)) < 0.4)
    ts = jnp.asarray(rng.uniform(0.01, 8.0, (64, 64)).astype(np.float32))
    k_s, ts_s = compact_candidates(keepm, 16, ts)
    k_o, ts_o = compact_candidates_onehot(keepm, 16, ts)
    k_s, ts_s, k_o, ts_o = map(np.asarray, (k_s, ts_s, k_o, ts_o))
    eq = np.array_equal(k_s, k_o) and np.array_equal(ts_s[k_s], ts_o[k_o])
    all_ok &= check("compact_candidates onehot == sort", eq)
    return all_ok


def smoke_frame() -> bool:
    """Bake a trained fox field and check brick-vs-row frame agreement."""
    import pickle
    from pathlib import Path

    from sienerf_tpu.engines.nerf import NerfEngine
    from sienerf_tpu.engines.nerf_baked import render_frame_baked
    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
    from sienerf_tpu.ops.optim import inference_params
    from sienerf_tpu.utils.config import load_network_config

    cache = next(
        (p for p in (Path(".cache/fox_16k.pkl"), Path(".cache/fox_4k.pkl")) if p.exists()),
        None,
    )
    if cache is None:
        print("skip  frame check: no cached fox field (.cache/fox_*.pkl)")
        return True
    ds = load_nerf_dataset("/root/reference/data/nerf/fox", downscale=4, max_images=24)
    cfg = load_network_config("/root/reference/configs/nerf/base.json")
    eng = NerfEngine.create(cfg, ds, train_batch_size=1 << 18)
    blob = pickle.load(open(cache, "rb"))
    state = jax.tree.map(jnp.asarray, blob["state"])
    eng._phase = blob["phase"]
    params = inference_params(state["opt"], state["params"])
    bf = state["occ"]["bitfield"]
    grid, meta = eng.bake_features(params, state["occ"], resolution=256, mode="nearest")
    W, H = 640, 360
    fl = tuple(np.asarray(eng.focals[0]) * W / eng.resolution[0])
    kw = dict(width=W, height=H, resolution=meta["resolution"], mode=meta["mode"],
              n_cascades=meta["n_cascades"], candidates=64, evals=16,
              step_scale=4.0, advance_iters=16, init_advance_iters=32)
    ref, _ = render_frame_baked(eng, params, bf, grid, eng.xforms[0], fl,
                                cull="coarse", fine="row", **kw)
    ok = True
    for cull, fine in [("brick", "row"), ("coarse", "brick"), ("brick", "brick")]:
        img, _ = render_frame_baked(eng, params, bf, grid, eng.xforms[0], fl,
                                    cull=cull, fine=fine, **kw)
        mse = float(np.mean((np.asarray(ref[..., :3]) - np.asarray(img[..., :3])) ** 2))
        psnr = -10 * np.log10(max(mse, 1e-12))
        ok &= check(f"frame {cull}/{fine} vs coarse/row: {psnr:.1f} dB", psnr > 40.0)
    return ok


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    ok = smoke_primitives()
    if "--frame" in sys.argv:
        ok &= smoke_frame()
    sys.exit(0 if ok else 1)

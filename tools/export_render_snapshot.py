"""Export a compact RENDER-ONLY snapshot from a training cache.

Strips the Adam/EMA optimizer moments, resolves the EMA'd inference
parameters (ops/optim.inference_params), and quantizes the hash table:
fp16 halves it (~270 MB — local convenience only), fp8 (default) stores
per-level-absmax-scaled e4m3 bytes (~134 MB) — small enough to COMMIT as
data/fox_render.snap so a fresh box benches the converged field without
retraining it (VERDICT r2 #3).  bench.py dequantizes to fp32 at load;
the baked-vs-live quality gate then measures any quantization cost
instead of assuming it.

Why this exists: the reference's own headline figure ("tens of ms at
1080p", docs/index.html:327) is measured on converged scenes, so benching
the converged field is the apples-to-apples protocol — and the field must
survive box wipes to keep rounds comparable.

Usage: python tools/export_render_snapshot.py .cache/fox_16k.pkl data/fox_render.snap [fp8|fp16]
       (also accepts a Session .snap/.ingp checkpoint as input — round 5:
       the 35k campaign snapshots re-anchor the committed bench field)
"""

import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# CPU-only: this is pure host tree surgery, and the TPU tunnel must stay
# free for whatever campaign is running (one client at a time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def quantize_grid_fp8(grid: np.ndarray):
    """(L,T,C,F) fp32 -> (e4m3 bytes (L,T*C*F) uint8, per-level scales).

    Mirrors ops/hashgrid.pack_table_fp8's per-level absmax scaling but
    stores raw bytes (host-side; numpy has no fp8 dtype — ml_dtypes,
    shipped with jax, does the rounding)."""
    import ml_dtypes

    L = grid.shape[0]
    flat = grid.reshape(L, -1)
    scale = np.maximum(np.abs(flat).max(axis=1), 1e-8) / 448.0  # e4m3 max
    q = (flat / scale[:, None]).astype(ml_dtypes.float8_e4m3fn)
    return q.view(np.uint8), scale.astype(np.float32)


def dequantize_grid_fp8(q: np.ndarray, scale: np.ndarray, shape):
    import ml_dtypes

    flat = np.asarray(q).view(ml_dtypes.float8_e4m3fn).astype(np.float32)
    return (flat * np.asarray(scale)[:, None]).reshape(shape)


def main():
    cache_in, snap_out = sys.argv[1], sys.argv[2]
    quant = sys.argv[3] if len(sys.argv) > 3 else "fp8"
    try:
        with open(cache_in, "rb") as fh:
            blob = pickle.load(fh)
        state = blob["state"]
    except Exception:
        # msgpack Session snapshot (io/snapshot.py) — the campaign
        # checkpoint format
        from sienerf_tpu.io.snapshot import load_snapshot

        payload = load_snapshot(cache_in)
        state = payload["state"]
        if "step" not in state:
            state = dict(state)
            state["step"] = np.asarray(
                payload.get("meta", {}).get("training_step", 0))
        blob = {
            "phase": payload.get("meta", {}).get("phase", "fast"),
            "mean_samples": payload.get("meta", {}).get("mean_samples", 0.0),
            "train_paths": payload.get("meta", {}).get("train_paths"),
        }

    from sienerf_tpu.io.snapshot import save_snapshot
    from sienerf_tpu.ops.optim import inference_params

    params = jax.tree.map(np.asarray, inference_params(state["opt"], state["params"]))

    def shrink(x):
        x = np.asarray(x)
        return x.astype(np.float16) if x.dtype == np.float32 else x

    meta = {
        "kind": "render_only",
        "phase": blob.get("phase", "fast"),
        "mean_samples": blob.get("mean_samples") or 0.0,
    }
    # training image list (ADVICE r3): the bench quality gate filters its
    # "held-out" views against the set the field actually trained on; the
    # bench protocol (fox ds4, first 24 images) is the fallback when an old
    # cache predates the recording
    if blob.get("train_paths"):
        meta["train_paths"] = list(blob["train_paths"])
    elif len(sys.argv) > 4:
        # record the training image list from the split transforms json
        # (campaign snapshots don't carry it; the bench gate needs it to
        # pick genuinely held-out views — ADVICE r3)
        import json

        tj = json.loads(Path(sys.argv[4]).read_text())
        meta["train_paths"] = [f["file_path"] for f in tj["frames"]]
    if quant == "fp8":
        grid = params.pop("grid")
        q, scale = quantize_grid_fp8(grid)
        params = jax.tree.map(shrink, params)
        params["grid_fp8"] = q
        params["grid_fp8_scale"] = scale
        meta["grid_shape"] = list(grid.shape)
        meta["kind"] = "render_only_fp8"
    else:
        params = jax.tree.map(shrink, params)

    render_state = {
        "params": params,
        "occ": {
            "bitfield": np.asarray(state["occ"]["bitfield"]),
            "mean_density": np.asarray(state["occ"]["mean_density"]),
        },
        "step": np.asarray(state["step"]),
    }
    save_snapshot(snap_out, render_state, meta=meta)
    sz = Path(snap_out).stat().st_size
    print(f"{snap_out}: {sz / 1e6:.1f} MB (step {int(state['step'])}, {quant})")


if __name__ == "__main__":
    main()

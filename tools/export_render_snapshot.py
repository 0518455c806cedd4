"""Export a compact RENDER-ONLY snapshot from a training cache.

Strips the Adam/EMA optimizer moments, resolves the EMA'd inference
parameters (ops/optim.inference_params), casts float leaves to fp16, and
writes a zlib'd msgpack snapshot (io/snapshot.py container) — ~4x smaller
than the full training state (the cell-packed hash table dominates: 537 MB
fp32 -> ~270 MB fp16 for the fox base config, so the artifact stays a
LOCAL convenience, not a committed asset).

Why this exists: bench.py loads data/fox_render.snap when the .cache
training state is gone, skipping the fallback train entirely on boxes
where the snapshot was produced earlier in the session.  The reference's
own headline figure ("tens of ms at 1080p", docs/index.html:327) is
measured on converged scenes, so benching the converged field is the
apples-to-apples protocol.

Usage: python tools/export_render_snapshot.py .cache/fox_16k.pkl data/fox_render.snap
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


def main():
    cache_in, snap_out = sys.argv[1], sys.argv[2]
    with open(cache_in, "rb") as fh:
        blob = pickle.load(fh)
    state = blob["state"]

    from sienerf_tpu.io.snapshot import save_snapshot
    from sienerf_tpu.ops.optim import inference_params

    params = inference_params(state["opt"], state["params"])

    def shrink(x):
        x = np.asarray(x)
        return x.astype(np.float16) if x.dtype == np.float32 else x

    render_state = {
        "params": jax.tree.map(shrink, jax.tree.map(np.asarray, params)),
        "occ": {
            "bitfield": np.asarray(state["occ"]["bitfield"]),
            "mean_density": np.asarray(state["occ"]["mean_density"]),
        },
        "step": np.asarray(state["step"]),
    }
    save_snapshot(
        snap_out,
        render_state,
        meta={
            "kind": "render_only",
            "phase": blob.get("phase", "fast"),
            "mean_samples": blob.get("mean_samples") or 0.0,
        },
    )
    sz = Path(snap_out).stat().st_size
    print(f"{snap_out}: {sz / 1e6:.1f} MB (step {int(state['step'])})")


if __name__ == "__main__":
    main()

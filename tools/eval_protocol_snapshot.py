"""Reference-protocol eval (spp 8, black bg, minT 1e-4) of ALL renderers
from the committed render-only snapshot, in one process.

The round-5 box reset lost the Session campaign checkpoints; the committed
`data/fox_render.snap` (12896-step converged fox field) is the only field
that survives a fresh box.  This drives the VERDICT r4 #4 certification —
live vs baked vs sweep at the spp-8 protocol operating point, exercising
the round-5 chain-phase (baked) and slab-phase (sweep) jitter — without
retraining.  One Session, one bake, three eval rows.

The absolute PSNRs are vs GT on the every-8th fox split views; NOTE the
snapshot field trained on a 24-image subset of the full transforms (not
the split-train set), so some split-test views may not be truly held out —
the live-vs-fast-renderer DELTA on identical views is the certified
quantity, matching the bench gate's parity criterion.

Usage: python tools/eval_protocol_snapshot.py [--downscale 4] [--spp 8]
       [--renderers live,baked,sweep]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--downscale", type=int, default=4)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--renderers", default="live,baked,sweep")
    ap.add_argument("--snapshot", default=str(REPO / "data" / "fox_render.snap"))
    args = ap.parse_args()

    from tools.benchmark_quality import eval_protocol

    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
    from sienerf_tpu.session import Session

    split = REPO / ".cache" / "fox_split"
    sess = Session()
    # the snapshot field was trained with the REFERENCE fox config
    # (8 levels x 4 features); the repo default base.json is 16x2 — the
    # MLP widths coincide (L*F = 32) so a mismatched engine RUNS but
    # evaluates the wrong hash geometry (~11 dB fog, r5 lesson)
    sess.load_file(split / "transforms_train.json", downscale=args.downscale,
                   network="/root/reference/configs/nerf/base.json")
    sess.load_snapshot(args.snapshot)
    bake_npz = REPO / ".cache" / "bake_256_16.npz"
    if bake_npz.exists():
        # reuse the cached bake (tools/rebake_cache.py) — it is baked from
        # this same committed snapshot; a fresh bake costs ~5.5 min of TPU
        import jax.numpy as jnp

        blob = np.load(bake_npz)
        meta = {"resolution": int(blob["resolution"]), "mode": "nearest",
                "n_cascades": int(blob["n_cascades"])}
        sess._baked = ({k: jnp.asarray(blob[k]) for k in blob.files
                        if k not in ("resolution", "n_cascades")}, meta)
        print("# using cached bake", file=sys.stderr)
    test_ds = load_nerf_dataset(split / "transforms_test.json",
                                downscale=args.downscale)

    results = {}
    for renderer in args.renderers.split(","):
        # "sweep:linear" etc. — extra kw after a colon becomes the sweep's
        # in-plane interp mode
        rname, _, interp = renderer.partition(":")
        rkw = {"interp": interp} if interp else None
        t0 = time.time()
        m = eval_protocol(sess, test_ds, spp=args.spp, renderer=rname,
                          render_kw=rkw)
        m["eval_s"] = round(time.time() - t0, 1)
        results[renderer] = m
        row = {
            "scene": "fox-snap", "steps": sess.training_step,
            "downscale": args.downscale, "spp": args.spp,
            "renderer": renderer, **m,
        }
        print(json.dumps(row), flush=True)
        with open(REPO / "QUALITY.md", "a") as fh:
            fh.write(
                f"| fox-snap | {sess.training_step} | {args.downscale} | "
                f"{renderer} | {m['psnr_avg']:.2f} | {m['psnr_min']:.2f} | "
                f"{m['psnr_max']:.2f} | {m['ssim_avg']:.3f} | eval {m['eval_s']}s |\n"
            )
    if "live" in results:
        for r in ("baked", "sweep"):
            if r in results:
                d = results["live"]["psnr_avg"] - results[r]["psnr_avg"]
                print(f"# spp-{args.spp} protocol delta live-vs-{r}: "
                      f"{d:+.2f} dB", flush=True)


if __name__ == "__main__":
    main()

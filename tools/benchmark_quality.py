"""Novel-view quality benchmark: train + evaluate at the reference protocol.

Reference protocol (reference scripts/run.py:210-268): every test view,
full resolution, spp 8, black background, min-transmittance 1e-4, PSNR in
sRGB against GT composited onto black.

Scenes:
  synth  — the regenerable synthetic benchmark (tools/make_synthetic_nerf.py
           into .cache/synth_bunny400); the lego-class stand-in since the
           reference ships no nerf_synthetic data and the box has no egress.
  fox    — held-out novel views (tools/split_transforms.py --every 8).

Usage:
  python tools/benchmark_quality.py synth --n_steps 5000
  python tools/benchmark_quality.py fox   --n_steps 8000 [--downscale 2]

Prints one JSON line per run {scene, steps, psnr_avg/min/max, ssim_avg}
and appends a row to QUALITY.md.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
CACHE = REPO / ".cache"


def eval_protocol(sess, test_ds, spp=8, renderer="live", render_kw=None):
    import jax.numpy as jnp

    from sienerf_tpu.metrics import psnr as psnr_of
    from sienerf_tpu.metrics import ssim as ssim_of

    rows = []
    for vi in range(test_ds.n_images):
        gt = test_ds.images[vi]
        h, w = gt.shape[:2]
        rgba = sess.render(
            w, h, test_ds.xforms[vi], tuple(np.asarray(test_ds.focal_lengths[vi])),
            spp=spp, screen_center=tuple(np.asarray(test_ds.principal_points[vi])),
            min_transmittance=1e-4, renderer=renderer, **(render_kw or {}),
        )
        pred = np.asarray(rgba[..., :3], np.float64)
        gt_rgb = gt[..., :3] * gt[..., 3:4]  # black background
        rows.append((psnr_of(pred, gt_rgb), ssim_of(pred, gt_rgb)))
        print(f"# view {vi}: psnr={rows[-1][0]:.2f} ssim={rows[-1][1]:.3f}",
              file=sys.stderr)
    ps = np.asarray([r[0] for r in rows])
    ss = np.asarray([r[1] for r in rows])
    return dict(psnr_avg=float(ps.mean()), psnr_min=float(ps.min()),
                psnr_max=float(ps.max()), ssim_avg=float(ss.mean()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", choices=["synth", "fox"])
    ap.add_argument("--n_steps", type=int, default=5000)
    ap.add_argument("--downscale", type=int, default=1)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--renderer", default="live", choices=["live", "baked", "sweep"])
    ap.add_argument("--snapshot", default=None, help="resume/eval-only from this snapshot")
    ap.add_argument("--save_snapshot", default=None)
    ap.add_argument("--eval_only", action="store_true")
    ap.add_argument("--near_reg", type=float, default=0.0,
                    help="near-region density regularizer (anti-floater, fox)")
    ap.add_argument("--checkpoint_every", type=int, default=0,
                    help="save --save_snapshot every N steps during training "
                    "(long protocol runs survive box resets)")
    ap.add_argument("--max_train_s", type=float, default=0.0,
                    help="stop training at this wall budget and evaluate "
                    "whatever step was reached (bounds the 35k protocol run)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (harness smoke; the axon "
                    "site hook ignores JAX_PLATFORMS so set the config)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.scene == "synth":
        root = CACHE / "synth_bunny400"
        train_json = root / "transforms_train.json"
        test_json = root / "transforms_test.json"
    else:
        root = CACHE / "fox_split"
        train_json = root / "transforms_train.json"
        test_json = root / "transforms_test.json"

    from sienerf_tpu.io.nerf_dataset import load_nerf_dataset
    from sienerf_tpu.session import Session

    sess = Session()
    t0 = time.time()

    def train_to(target_steps):
        """Train toward target_steps in checkpointed, wall-bounded chunks."""
        chunk = args.checkpoint_every or target_steps
        while sess.training_step < target_steps:
            if args.max_train_s and time.time() - t0 > args.max_train_s:
                print(f"# wall budget {args.max_train_s:.0f}s reached at step "
                      f"{sess.training_step} — evaluating here", file=sys.stderr)
                break
            n = min(chunk, target_steps - sess.training_step)
            sess.train(n)
            if args.checkpoint_every and args.save_snapshot:
                sess.save_snapshot(args.save_snapshot)
                print(f"# checkpoint @ step {sess.training_step} "
                      f"({time.time() - t0:.0f}s)", file=sys.stderr)

    if args.snapshot:
        # the snapshot stores params + config but not the dataset: build
        # the engine from the scene first, then swap in the restored state
        ekw = {"near_density_reg": args.near_reg} if args.near_reg else {}
        sess.load_file(train_json, downscale=args.downscale, **ekw)
        sess.load_snapshot(args.snapshot)
        if not args.eval_only:
            train_to(args.n_steps)
    else:
        ekw = {"near_density_reg": args.near_reg} if args.near_reg else {}
        sess.load_file(train_json, downscale=args.downscale, **ekw)
        train_to(args.n_steps)
    train_s = time.time() - t0
    if args.save_snapshot:
        sess.save_snapshot(args.save_snapshot)

    test_ds = load_nerf_dataset(test_json, downscale=args.downscale)
    t1 = time.time()
    m = eval_protocol(sess, test_ds, spp=args.spp, renderer=args.renderer)
    result = {
        "scene": args.scene, "steps": sess.training_step,
        "downscale": args.downscale, "spp": args.spp,
        "renderer": args.renderer, "train_s": round(train_s, 1),
        "eval_s": round(time.time() - t1, 1), **{k: round(v, 3) for k, v in m.items()},
    }
    print(json.dumps(result))
    qmd = REPO / "QUALITY.md"
    if not qmd.exists():
        qmd.write_text(
            "# Novel-view quality (reference protocol: all test views, "
            "spp 8, black bg, minT 1e-4)\n\n"
            "| scene | steps | ds | renderer | PSNR avg | min | max | SSIM | train s |\n"
            "|---|---|---|---|---|---|---|---|---|\n"
        )
    with open(qmd, "a") as f:
        f.write(
            f"| {result['scene']} | {result['steps']} | {args.downscale} | "
            f"{args.renderer} | {result['psnr_avg']:.2f} | {result['psnr_min']:.2f} | "
            f"{result['psnr_max']:.2f} | {result['ssim_avg']:.3f} | {result['train_s']:.0f} |\n"
        )


if __name__ == "__main__":
    main()

"""Offline orbit demo: dynamic-resolution-controlled fly-through.

Usage:
  python tools/orbit_render.py <scene-or-snapshot> [--frames N] [--target-ms T]
      [--serve] [--renderer live|baked] [--foveate D]

With --serve, starts the interactive HTTP viewer instead (sienerf_tpu.viewer).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sienerf_tpu.session import Session  # noqa: E402
from sienerf_tpu.viewer import orbit_benchmark, serve  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--train-steps", type=int, default=0)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--target-ms", type=float, default=250.0)
    ap.add_argument("--serve", action="store_true")
    ap.add_argument("--port", type=int, default=8060)
    ap.add_argument("--renderer", default="live", choices=["live", "baked"])
    ap.add_argument("--foveate", type=float, default=1.0,
                    help=">1 enables foveated rendering at this center density")
    ap.add_argument("--out", default=None, help="dir for per-frame PNGs")
    args = ap.parse_args()

    sess = Session()
    if str(args.scene).endswith((".ingp", ".snap", ".msgpack")):
        sess.load_snapshot(args.scene)
    else:
        sess.load_file(args.scene, downscale=4)
        if args.train_steps:
            sess.train(args.train_steps)

    kw = {}
    if args.renderer == "baked":
        kw["renderer"] = "baked"
    if args.foveate > 1.0:
        kw["foveation_density"] = args.foveate

    if args.serve:
        serve(sess, port=args.port, width=args.width, height=args.height,
              target_ms=args.target_ms, **kw)
        return

    if args.out:
        Path(args.out).mkdir(parents=True, exist_ok=True)
    rows = orbit_benchmark(
        sess, n_frames=args.frames, width=args.width, height=args.height,
        target_ms=args.target_ms, out_dir=args.out, **kw,
    )
    for r in rows:
        print(json.dumps(r))
    ms = [r["ms"] for r in rows[2:]]
    print(f"# steady-state: {sum(ms)/len(ms):.0f} ms avg "
          f"(target {args.target_ms:.0f}), final rung {rows[-1]['rung']}")


if __name__ == "__main__":
    main()

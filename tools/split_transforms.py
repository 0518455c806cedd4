"""Split a NeRF transforms.json into held-out train/test transforms.

The reference's real-capture scenes (fox) ship one transforms.json with no
test split; novel-view evaluation needs held-out cameras.  Writes
transforms_train.json / transforms_test.json next to the source (every
k-th frame to test, matching common NeRF practice).

Usage: python tools/split_transforms.py /root/reference/data/nerf/fox [--every 8]
       [--out_dir DIR]   (default: alongside the source, or DIR if the
        source dir is read-only)
"""

import argparse
import json
import shutil
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", help="dir containing transforms.json, or the json itself")
    ap.add_argument("--every", type=int, default=8, help="every k-th frame is test")
    ap.add_argument("--out_dir", default=None)
    args = ap.parse_args()

    src = Path(args.scene)
    if src.is_dir():
        src = src / "transforms.json"
    t = json.loads(src.read_text())
    frames = t["frames"]
    test_idx = set(range(0, len(frames), args.every))
    out_dir = Path(args.out_dir) if args.out_dir else src.parent
    out_dir.mkdir(parents=True, exist_ok=True)

    # image paths are relative to the transforms file: keep them valid from
    # out_dir by rewriting relative paths against the source dir
    def fix(frame):
        f = dict(frame)
        p = Path(f["file_path"])
        if not p.is_absolute():
            f["file_path"] = str((src.parent / p).resolve())
        return f

    for name, pred in (("train", lambda i: i not in test_idx),
                       ("test", lambda i: i in test_idx)):
        tt = {k: v for k, v in t.items() if k != "frames"}
        tt["frames"] = [fix(f) for i, f in enumerate(frames) if pred(i)]
        out = out_dir / f"transforms_{name}.json"
        out.write_text(json.dumps(tt, indent=1))
        print(f"{out}: {len(tt['frames'])} frames")


if __name__ == "__main__":
    main()

"""Scene registry: named scene catalogs with per-scene defaults.

Behavioral spec: reference scripts/scenes.py:15-228 — dictionaries of known
scenes (nerf synthetic, fox, mipnerf360, image/sdf/volume samples) mapping
name -> {data path, config defaults}; run.py resolves bare scene names
through it.
"""

from __future__ import annotations

from pathlib import Path

SCENES_NERF = {
    "fox": {
        "data": "data/nerf/fox",
        "dataset_train": "",
        "dataset_test": "",
        "aabb_scale": 4,
    },
    # nerf-synthetic catalog (blender scenes); dataset not shipped — paths
    # resolve against --data_root
    **{
        name: {
            "data": f"data/nerf_synthetic/{name}",
            "dataset_train": "transforms_train.json",
            "dataset_test": "transforms_test.json",
            "aabb_scale": 1,
        }
        for name in ("lego", "chair", "drums", "ficus", "hotdog", "materials", "mic", "ship")
    },
}

SCENES_IMAGE = {
    "albert": {"data": "data/image/albert.exr"},
}

SCENES_SDF = {
    "bunny": {"data": "data/geometry/objs/bunny.obj"},
    "armadillo": {"data": "data/geometry/objs/armadillo.obj"},
}

SCENES_GEOMETRY = {
    "geometrypaths": {"data": "data/geometry/geometrypaths.json"},
    "geometrypathsnerf": {"data": "data/geometry/geometrypathsnerf.json"},
}

ALL_SCENES = {**SCENES_NERF, **SCENES_IMAGE, **SCENES_SDF, **SCENES_GEOMETRY}


def resolve_scene(name_or_path: str, data_roots=(".", "/root/reference")) -> str:
    """Bare scene name -> data path (searched under data_roots); paths pass
    through unchanged (reference run.py scene resolution)."""
    p = Path(name_or_path)
    if p.exists():
        return str(p)
    entry = ALL_SCENES.get(str(name_or_path))
    if entry is None:
        return str(name_or_path)
    for root in data_roots:
        cand = Path(root) / entry["data"]
        if cand.exists():
            return str(cand)
    raise FileNotFoundError(
        f"scene '{name_or_path}' maps to {entry['data']} but it was not found under {data_roots}"
    )

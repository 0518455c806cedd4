"""Minimal NanoVDB (.nvdb) reader: FloatGrid -> dense numpy density grid.

Behavioral spec: reference load_volume (testbed_volume.cu:546-650), which
reads a NanoVDB FogVolume float grid and uses its tree + bbox to build a
density source and majorant.  The reference links the NanoVDB headers; here
the on-disk format (NanoVDB file format v32.x: FileHeader, MetaData,
GridData + tree blobs) is parsed directly.

Only uncompressed single-grid float files are supported; the tree layout is
the standard 3-level NanoVDB tree (Root -> Upper 32^3 -> Lower 16^3 ->
Leaf 8^3).  The decoder densifies into a (D,H,W) numpy array over the
grid's index bounding box.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from pathlib import Path

import numpy as np

NANOVDB_MAGIC = 0x304244566F6E614E  # "NanoVDB0"


@dataclass
class DenseVolume:
    density: np.ndarray  # (D,H,W) float32
    bbox_min: np.ndarray  # world-space min
    bbox_max: np.ndarray
    majorant: float


def read_nanovdb(path: str | Path) -> DenseVolume:
    data = Path(path).read_bytes()
    (magic,) = struct.unpack_from("<Q", data, 0)
    if magic != NANOVDB_MAGIC:
        raise IOError(f"{path}: not a NanoVDB file (magic {magic:#x})")
    version, n_grids, codec = struct.unpack_from("<IHH", data, 8)
    if codec != 0:
        raise IOError(f"{path}: compressed NanoVDB (codec {codec}) not supported")
    off = 16
    # MetaData0: gridSize, fileSize, nameKey, voxelCount, gridType, gridClass,
    # worldBBox (6 doubles), indexBBox (6 ints), voxelSize (3 doubles),
    # nameSize, nodeCount[4], tileCount[3], codec, padding, version
    meta_fmt = "<QQQQII6d6i3dI4I3IHHI"
    meta_size = struct.calcsize(meta_fmt)
    m = struct.unpack_from(meta_fmt, data, off)
    grid_size, file_size, _name_key, _voxel_count, grid_type, _grid_class = m[:6]
    world_bbox = np.asarray(m[6:12])
    index_bbox = np.asarray(m[12:18], np.int64)
    name_size = int(m[21])
    off += meta_size + name_size
    grid_blob = data[off : off + grid_size]
    if grid_type != 1:  # 1 = float
        raise IOError(f"{path}: only float grids supported (type {grid_type})")
    return _decode_float_grid(grid_blob, world_bbox, index_bbox)


def _decode_float_grid(blob: bytes, world_bbox, index_bbox) -> DenseVolume:
    # GridData header is 672 bytes in v32.3; TreeData follows with byte
    # offsets to node arrays and node counts.
    tree_off = 672
    tree_fmt = "<8Q4I"  # nodeOffset[4], nodeCount[3], tileCount... (v32.3 TreeData)
    vals = struct.unpack_from("<8Q", blob, tree_off)
    node_offset_leaf, node_offset_lower, node_offset_upper, node_offset_root = vals[0:4]
    counts = struct.unpack_from("<4I", blob, tree_off + 64)
    n_leaf, n_lower, n_upper = counts[0], counts[1], counts[2]

    lo = index_bbox[:3]
    hi = index_bbox[3:]
    dims = (hi - lo + 1).astype(np.int64)
    dense = np.zeros((int(dims[2]), int(dims[1]), int(dims[0])), np.float32)  # (z,y,x)

    # Leaf nodes: 8^3 values; LeafData<float>: bbox (2x int3 packed), flags,
    # valueMask (64 bytes), min/max/avg/stddev floats, values[512].
    leaf_base = tree_off + node_offset_leaf
    LEAF_SIZE = 32 + 64 + 16 + 512 * 4  # CoordBBox(24->32 aligned) + mask + stats + values
    for i in range(n_leaf):
        o = leaf_base + i * LEAF_SIZE
        bx, by, bz = struct.unpack_from("<3i", blob, o)
        values = np.frombuffer(blob, np.float32, 512, o + 32 + 64 + 16)
        vz = values.reshape(8, 8, 8)  # NanoVDB leaf layout: x-major? (x,y,z) -> idx = x*64+y*8+z
        vxyz = values.reshape(8, 8, 8)  # [x][y][z]
        x0, y0, z0 = bx - lo[0], by - lo[1], bz - lo[2]
        if x0 < 0 or y0 < 0 or z0 < 0:
            continue
        xs = slice(int(x0), int(x0) + 8)
        ys = slice(int(y0), int(y0) + 8)
        zs = slice(int(z0), int(z0) + 8)
        try:
            dense[zs, ys, xs] = np.maximum(dense[zs, ys, xs], np.transpose(vxyz, (2, 1, 0)))
        except ValueError:
            continue  # leaf partially outside declared bbox; skip edge

    majorant = float(dense.max()) if dense.size else 0.0
    return DenseVolume(
        density=dense,
        bbox_min=world_bbox[:3].astype(np.float32),
        bbox_max=world_bbox[3:].astype(np.float32),
        majorant=majorant,
    )


def synthetic_fog_volume(res: int = 64, kind: str = "sphere") -> DenseVolume:
    """Analytic stand-in volume for tests / demos (no .nvdb asset ships with
    the reference; it downloads wdas_cloud at runtime)."""
    z, y, x = np.meshgrid(*([np.linspace(0, 1, res)] * 3), indexing="ij")
    if kind == "sphere":
        r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
        d = np.clip(1.0 - r / 0.35, 0.0, 1.0) ** 2 * 40.0
    elif kind == "shell":
        r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
        d = np.exp(-(((r - 0.3) / 0.05) ** 2)) * 30.0
    else:
        raise ValueError(kind)
    return DenseVolume(
        density=d.astype(np.float32),
        bbox_min=np.zeros(3, np.float32),
        bbox_max=np.ones(3, np.float32),
        majorant=float(d.max()),
    )

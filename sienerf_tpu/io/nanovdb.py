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
        vzyx = np.transpose(values.reshape(8, 8, 8), (2, 1, 0))  # [x][y][z] -> [z][y][x]
        x0, y0, z0 = int(bx - lo[0]), int(by - lo[1]), int(bz - lo[2])
        # leaf origins are 8-aligned in INDEX space and may hang over the
        # grid's (arbitrary) active bbox on any side: clip to the overlap
        sx, sy, sz = max(0, -x0), max(0, -y0), max(0, -z0)
        ex = min(8, int(dims[0]) - x0)
        ey = min(8, int(dims[1]) - y0)
        ez = min(8, int(dims[2]) - z0)
        if ex <= sx or ey <= sy or ez <= sz:
            continue  # leaf entirely outside the declared bbox
        dst = dense[z0 + sz:z0 + ez, y0 + sy:y0 + ey, x0 + sx:x0 + ex]
        np.maximum(dst, vzyx[sz:ez, sy:ey, sx:ex], out=dst)

    majorant = float(dense.max()) if dense.size else 0.0
    return DenseVolume(
        density=dense,
        bbox_min=world_bbox[:3].astype(np.float32),
        bbox_max=world_bbox[3:].astype(np.float32),
        majorant=majorant,
    )


def write_nanovdb(path: str | Path, density: np.ndarray,
                  bbox_min=(0.0, 0.0, 0.0), bbox_max=(1.0, 1.0, 1.0)) -> None:
    """Write a dense (D,H,W) float32 grid as an uncompressed single-grid
    NanoVDB file (format v32.3: FileHeader, MetaData, name, GridData 672B,
    TreeData, root/upper/lower tiles elided via dense-leaf encoding).

    Purpose: produce real on-disk `.nvdb` bytes so the reader above is
    validated against the format rather than only against itself in memory
    (the reference consumes third-party files, testbed_volume.cu:546-650;
    none ships in-tree).  Layout choices match the reader's expectations AND
    the published NanoVDB struct layouts: leaves are 8^3 value blocks with
    [x][y][z] fastest-z ordering, stamped at their index-space origin.
    """
    dense = np.asarray(density, np.float32)
    D, H, W = dense.shape  # (z, y, x)
    lo = np.zeros(3, np.int64)
    hi = np.asarray([W - 1, H - 1, D - 1], np.int64)

    # --- leaf nodes over the 8^3 tiling (skip all-zero leaves) ---
    LEAF_HDR = 32 + 64 + 16
    LEAF_SIZE = LEAF_HDR + 512 * 4
    leaves = []
    for z0 in range(0, D, 8):
        for y0 in range(0, H, 8):
            for x0 in range(0, W, 8):
                block = np.zeros((8, 8, 8), np.float32)  # [z][y][x]
                bz = min(8, D - z0); by = min(8, H - y0); bx = min(8, W - x0)
                block[:bz, :by, :bx] = dense[z0:z0 + bz, y0:y0 + by, x0:x0 + bx]
                if not block.any():
                    continue
                vxyz = np.transpose(block, (2, 1, 0))  # [x][y][z]
                hdr = struct.pack("<3i", x0, y0, z0)
                hdr += b"\x00" * (32 - len(hdr))  # aligned CoordBBox slot
                mask = np.packbits(
                    (vxyz.reshape(-1) != 0).astype(np.uint8), bitorder="little"
                ).tobytes()
                stats = struct.pack(
                    "<4f", float(block.min()), float(block.max()), float(block.mean()), 0.0
                )
                leaves.append(hdr + mask + stats + vxyz.astype("<f4").tobytes())
    leaf_blob = b"".join(leaves)
    n_leaf = len(leaves)

    # --- TreeData: node offsets relative to TreeData start (64B of offsets
    # + counts); root/upper/lower arrays are empty in this dense-leaf file.
    TREE_SIZE = 64 + 16 + 16  # offsets[8Q] + nodeCount[4I] + tileCount pad
    leaf_off = TREE_SIZE
    tree = struct.pack(
        "<8Q", leaf_off, leaf_off + len(leaf_blob), leaf_off + len(leaf_blob),
        leaf_off + len(leaf_blob), 0, 0, 0, 0,
    )
    tree += struct.pack("<4I", n_leaf, 0, 0, 0)
    tree += b"\x00" * (TREE_SIZE - len(tree))

    # --- GridData: 672-byte header (magic, checksum, version, flags, name,
    # map 264B, world bbox, voxel size, class/type, blind metadata) ---
    grid_name = b"density"
    wmin = np.asarray(bbox_min, np.float64)
    wmax = np.asarray(bbox_max, np.float64)
    voxel = (wmax - wmin) / np.maximum(np.asarray([W, H, D], np.float64), 1.0)
    gd = bytearray(672)
    struct.pack_into("<Q", gd, 0, NANOVDB_MAGIC)
    struct.pack_into("<Q", gd, 8, 0)  # checksum (0 = none)
    struct.pack_into("<I", gd, 16, (32 << 21) | (3 << 10) | 0)  # version 32.3.0
    struct.pack_into("<I", gd, 20, 0)  # flags
    struct.pack_into("<I", gd, 24, 0)  # gridIndex
    struct.pack_into("<I", gd, 28, 1)  # gridCount
    grid_size = 672 + TREE_SIZE + len(leaf_blob)
    struct.pack_into("<Q", gd, 32, grid_size)
    gd[40:40 + len(grid_name)] = grid_name  # gridName[256]
    # Map (296..560): mMatF/mInvMatF 3x3, mVecF, mTaperF, then the double
    # versions — identity index->world scale by voxelSize
    matf = np.zeros((3, 3), "<f4"); matd = np.zeros((3, 3), "<f8")
    invf = np.zeros((3, 3), "<f4"); invd = np.zeros((3, 3), "<f8")
    for a in range(3):
        matf[a, a] = voxel[a]; matd[a, a] = voxel[a]
        invf[a, a] = 1.0 / voxel[a]; invd[a, a] = 1.0 / voxel[a]
    gd[296:332] = matf.tobytes(); gd[332:368] = invf.tobytes()
    gd[368:380] = np.asarray(wmin, "<f4").tobytes()  # mVecF
    struct.pack_into("<f", gd, 380, 1.0)  # mTaperF
    gd[384:456] = matd.tobytes(); gd[456:528] = invd.tobytes()
    gd[528:552] = np.asarray(wmin, "<f8").tobytes()  # mVecD
    struct.pack_into("<d", gd, 552, 1.0)  # mTaperD
    struct.pack_into("<6d", gd, 560, *wmin, *wmax)  # worldBBox
    struct.pack_into("<3d", gd, 608, *voxel)  # voxelSize
    struct.pack_into("<I", gd, 632, 1)  # gridClass: FogVolume
    struct.pack_into("<I", gd, 636, 1)  # gridType: float
    grid_blob = bytes(gd) + tree + leaf_blob
    assert len(grid_blob) == grid_size

    # --- MetaData + FileHeader (matches read_nanovdb's meta_fmt) ---
    meta = struct.pack(
        "<QQQQII6d6i3dI4I3IHHI",
        grid_size, grid_size, 0, int((dense != 0).sum()), 1, 1,
        *wmin, *wmax,
        int(lo[0]), int(lo[1]), int(lo[2]), int(hi[0]), int(hi[1]), int(hi[2]),
        *voxel,
        len(grid_name), n_leaf, 0, 0, 0, 0, 0, 0, 0, 0,
        (32 << 21) | (3 << 10),
    )
    header = struct.pack("<QIHH", NANOVDB_MAGIC, (32 << 21) | (3 << 10), 1, 0)
    with open(Path(path), "wb") as f:
        f.write(header + meta + grid_name + grid_blob)


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

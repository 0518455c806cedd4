"""Snapshot save/load: msgpack(+zlib) serialization of training state.

Behavioral spec: reference save_snapshot/load_snapshot
(testbed.cu:5219-5495): trainer params, fp16 density grid, dataset
metadata, camera state, version field; `.ingp` = zlib-wrapped msgpack.

Our container keeps the same shape of content with an explicit layout
(arrays as {dtype, shape, data} leaves).  The density grid is stored fp16
like the reference.  Extension `.snap` (or `.ingp` — both zlib'd msgpack).
"""

from __future__ import annotations

import zlib
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import msgpack
import numpy as np

SNAPSHOT_VERSION = 1


def _pack_leaf(x):
    if isinstance(x, (jnp.ndarray, np.ndarray)):
        arr = np.asarray(x)
        return {
            b"__ndarray__": True,
            b"dtype": arr.dtype.str,
            b"shape": list(arr.shape),
            b"data": arr.tobytes(),
        }
    return x


def _unpack_leaf(x):
    if isinstance(x, dict) and (b"__ndarray__" in x or "__ndarray__" in x):
        g = lambda k: x.get(k.encode()) if k.encode() in x else x.get(k)
        arr = np.frombuffer(g("data"), dtype=np.dtype(g("dtype"))).reshape(g("shape"))
        return arr.copy()
    return x


def _pack_tree(tree):
    if isinstance(tree, dict):
        return {k: _pack_tree(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_pack_tree(v) for v in tree]
    return _pack_leaf(tree)


def _unpack_tree(tree):
    if isinstance(tree, dict):
        if b"__ndarray__" in tree or "__ndarray__" in tree:
            return _unpack_leaf(tree)
        return {(k.decode() if isinstance(k, bytes) else k): _unpack_tree(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_unpack_tree(v) for v in tree]
    return tree


def save_snapshot(path: str | Path, state: dict, config: dict | None = None, meta: dict | None = None) -> None:
    """Serialize a training state pytree (density grid stored fp16)."""
    state = jax.tree.map(lambda x: np.asarray(x), state)
    if "occ" in state and "density" in state["occ"]:
        state["occ"] = dict(state["occ"])
        state["occ"]["density"] = np.asarray(state["occ"]["density"], np.float16)
    payload = {
        "version": SNAPSHOT_VERSION,
        "state": _pack_tree(state),
        "config": config or {},
        "meta": meta or {},
    }
    raw = msgpack.packb(payload, use_bin_type=True)
    Path(path).write_bytes(zlib.compress(raw, 6))


def load_snapshot(path: str | Path) -> dict:
    """Returns {"version", "state", "config", "meta"} with numpy leaves."""
    raw = Path(path).read_bytes()
    try:
        raw = zlib.decompress(raw)
    except zlib.error:
        pass  # uncompressed snapshot
    payload = msgpack.unpackb(raw, raw=False, strict_map_key=False)
    payload["state"] = _unpack_tree(payload["state"])
    if "occ" in payload["state"] and "density" in payload["state"]["occ"]:
        payload["state"]["occ"]["density"] = np.asarray(
            payload["state"]["occ"]["density"], np.float32
        )
    return payload


def load_render_snapshot(path: str | Path):
    """Load a render-only snapshot (tools/export_render_snapshot.py) into
    device-ready (params, bitfield, meta).

    Handles the committable fp8 variant (per-level absmax e4m3 hash table)
    by dequantizing to fp32, and widens fp16 leaves back to fp32.  This is
    the shared fresh-box entry point for bench.py, the irradiance demo, and
    the orbit viewer — one loader, one semantics."""
    payload = load_snapshot(path)
    rs = payload["state"]
    raw = dict(rs["params"])
    meta = dict(payload["meta"])
    if meta.get("kind") == "render_only_fp8":
        # Emit the e4m3 bytes PRE-PACKED in pack_table_fp8's row format
        # (4 bytes bitcast as one f32, little-endian — identical to
        # jax.lax.bitcast_convert_type on the minor axis) instead of
        # dequantizing to the 4-D (L, T, C, F) cell table: a minor-dim-F
        # device array tile-pads (8, 128) -> up to 64x (measured: a 537 MB
        # fox table asked for a 34 GB allocation inside Session.render's
        # graph, r5 box-reset session).  _encode_pos dispatches on the
        # grid_fp8 key, so every consumer (render, bake, eval) reads the
        # packed rows; the dequantized values are bit-identical
        # (e4m3 * per-level scale either way).
        q = np.ascontiguousarray(np.asarray(raw["grid_fp8"]))
        scale = np.asarray(raw["grid_fp8_scale"])
        L, T, C, F = meta["grid_shape"]
        raw["grid_fp8"] = (
            q.reshape(L, T, (C * F) // 4, 4).view(np.uint32)
            .squeeze(-1).view(np.float32)
        )
        raw["grid_fp8_scale"] = scale.astype(np.float32)
    params = jax.tree.map(
        lambda x: jnp.asarray(
            x, jnp.float32 if np.asarray(x).dtype == np.float16 else None
        ),
        raw,
    )
    bitfield = jnp.asarray(rs["occ"]["bitfield"])
    meta["step"] = int(np.asarray(rs["step"]))
    return params, bitfield, meta

"""Minimal MessagePack codec (no external deps).

Covers the subset nlohmann::json's to_msgpack/from_msgpack emits — which is
what the reference's snapshot files use (testbed.cu:5277-5281
`json::to_msgpack`): nil/bool/ints/floats/str/bin/array/map.  Binary blobs
(tcnn GPUMemory<half> arrays) serialize as msgpack bin8/16/32.
"""

from __future__ import annotations

import struct


def pack(obj) -> bytes:
    out = bytearray()
    _pack_into(obj, out)
    return bytes(out)


def _pack_into(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(obj & 0xFF)
        elif 0 <= obj <= 0xFF:
            out += struct.pack(">BB", 0xCC, obj)
        elif 0 <= obj <= 0xFFFF:
            out += struct.pack(">BH", 0xCD, obj)
        elif 0 <= obj <= 0xFFFFFFFF:
            out += struct.pack(">BI", 0xCE, obj)
        elif 0 <= obj:
            out += struct.pack(">BQ", 0xCF, obj)
        elif obj >= -(1 << 7):
            out += struct.pack(">Bb", 0xD0, obj)
        elif obj >= -(1 << 15):
            out += struct.pack(">Bh", 0xD1, obj)
        elif obj >= -(1 << 31):
            out += struct.pack(">Bi", 0xD2, obj)
        else:
            out += struct.pack(">Bq", 0xD3, obj)
    elif isinstance(obj, float):
        out += struct.pack(">Bd", 0xCB, obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += struct.pack(">BB", 0xD9, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        b = bytes(obj)
        n = len(b)
        if n <= 0xFF:
            out += struct.pack(">BB", 0xC4, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += b
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for v in obj:
            _pack_into(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, v in obj.items():
            _pack_into(str(k), out)
            _pack_into(v, out)
    else:
        # numpy scalars and arrays
        import numpy as np

        if isinstance(obj, np.integer):
            _pack_into(int(obj), out)
        elif isinstance(obj, np.floating):
            _pack_into(float(obj), out)
        elif isinstance(obj, np.ndarray):
            _pack_into(obj.tobytes(), out)
        else:
            raise TypeError(f"cannot msgpack {type(obj)}")


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated msgpack")
        self.pos += n
        return b

    def u(self, fmt: str):
        return struct.unpack(fmt, self.take(struct.calcsize(fmt)))[0]


def unpack(buf: bytes):
    r = _Reader(buf)
    obj = _unpack_one(r)
    return obj


def _unpack_one(r: _Reader):
    t = r.u(">B")
    if t <= 0x7F:
        return t
    if t >= 0xE0:
        return t - 0x100
    if 0x80 <= t <= 0x8F:
        return {_unpack_one(r): _unpack_one(r) for _ in range(t & 0xF)}
    if 0x90 <= t <= 0x9F:
        return [_unpack_one(r) for _ in range(t & 0xF)]
    if 0xA0 <= t <= 0xBF:
        return r.take(t & 0x1F).decode("utf-8")
    if t == 0xC0:
        return None
    if t == 0xC2:
        return False
    if t == 0xC3:
        return True
    if t == 0xC4:
        return r.take(r.u(">B"))
    if t == 0xC5:
        return r.take(r.u(">H"))
    if t == 0xC6:
        return r.take(r.u(">I"))
    if t == 0xCA:
        return r.u(">f")
    if t == 0xCB:
        return r.u(">d")
    if t == 0xCC:
        return r.u(">B")
    if t == 0xCD:
        return r.u(">H")
    if t == 0xCE:
        return r.u(">I")
    if t == 0xCF:
        return r.u(">Q")
    if t == 0xD0:
        return r.u(">b")
    if t == 0xD1:
        return r.u(">h")
    if t == 0xD2:
        return r.u(">i")
    if t == 0xD3:
        return r.u(">q")
    if t == 0xD9:
        return r.take(r.u(">B")).decode("utf-8")
    if t == 0xDA:
        return r.take(r.u(">H")).decode("utf-8")
    if t == 0xDB:
        return r.take(r.u(">I")).decode("utf-8")
    if t == 0xDC:
        return [_unpack_one(r) for _ in range(r.u(">H"))]
    if t == 0xDD:
        return [_unpack_one(r) for _ in range(r.u(">I"))]
    if t == 0xDE:
        return {_unpack_one(r): _unpack_one(r) for _ in range(r.u(">H"))}
    if t == 0xDF:
        return {_unpack_one(r): _unpack_one(r) for _ in range(r.u(">I"))}
    if 0xD4 <= t <= 0xD8 or t in (0xC7, 0xC8, 0xC9):
        # ext types: skip payload, return raw (nlohmann doesn't emit these)
        if t == 0xC7:
            n = r.u(">B")
        elif t == 0xC8:
            n = r.u(">H")
        elif t == 0xC9:
            n = r.u(">I")
        else:
            n = 1 << (t - 0xD4)
        r.take(1)  # ext type byte
        return r.take(n)
    raise ValueError(f"unknown msgpack tag 0x{t:02x}")

"""tinylogger-equivalent minimal logging (reference uses tlog::info/warning/success)."""

from __future__ import annotations

import sys
import time

_T0 = time.time()
_VERBOSE = True
_STREAM = None  # None = sys.stdout at emit time


def set_verbose(v: bool) -> None:
    global _VERBOSE
    _VERBOSE = v


def set_stream(stream) -> None:
    """Route info/success to `stream` (e.g. sys.stderr for tools whose
    stdout is a machine-parsed contract, like bench.py's one JSON line)."""
    global _STREAM
    _STREAM = stream


def _emit(tag: str, msg: str, stream=None) -> None:
    if not _VERBOSE:
        return
    stream = stream or _STREAM or sys.stdout
    print(f"[{time.time() - _T0:8.2f}s] {tag:<7s} {msg}", file=stream, flush=True)


def info(msg: str) -> None:
    _emit("INFO", msg)


def success(msg: str) -> None:
    _emit("SUCCESS", msg)


def warning(msg: str) -> None:
    _emit("WARNING", msg, sys.stderr)


def error(msg: str) -> None:
    _emit("ERROR", msg, sys.stderr)

"""tcnn-style JSON network-config system.

Behavioral spec: reference src/testbed.cu:223-275 (`find_network_config`,
`load_network_config`, `merge_parent_network_config`).  Configs are JSON
files (JSON-with-// comments tolerated, as in configs/image/base.json) with
an optional ``"parent"`` key naming another config whose keys are merged in
underneath (child wins, recursive dict merge).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any

_COMMENT_RE = re.compile(r'("(?:\\.|[^"\\])*")|//[^\n]*')


def _strip_comments(text: str) -> str:
    # Remove // comments while leaving string literals intact.
    return _COMMENT_RE.sub(lambda m: m.group(1) or "", text)


def loads_jsonc(text: str) -> Any:
    return json.loads(_strip_comments(text))


def load_jsonc(path: str | Path) -> Any:
    return loads_jsonc(Path(path).read_text())


def deep_merge(parent: dict, child: dict) -> dict:
    """Recursive dict merge; child values win (reference merge_parent_network_config)."""
    out = dict(parent)
    for k, v in child.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_network_config(path: str | Path) -> dict:
    """Load a network config, resolving ``parent`` inheritance chains."""
    path = Path(path)
    config = load_jsonc(path)
    seen = {path.resolve()}
    while isinstance(config, dict) and "parent" in config:
        parent_path = (path.parent / config.pop("parent")).resolve()
        if parent_path in seen:
            raise ValueError(f"config parent cycle at {parent_path}")
        seen.add(parent_path)
        parent = load_jsonc(parent_path)
        config = deep_merge(parent, config)
        path = parent_path
    return config


def find_network_config(configs_dir: str | Path, mode: str, name: str = "base") -> Path:
    """Resolve ``configs/<mode>/<name>.json`` (reference find_network_config)."""
    p = Path(configs_dir) / mode / f"{name}.json"
    if not p.exists():
        raise FileNotFoundError(p)
    return p


def default_configs_dir() -> Path:
    return Path(__file__).resolve().parents[2] / "configs"

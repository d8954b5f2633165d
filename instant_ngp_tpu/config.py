"""Network-config loading.

Mirrors the reference's config behavior (testbed.cu:254-310):
  * `.json` files may contain ``//`` line comments (the reference uses
    nlohmann::json with comments enabled — e.g. configs/image/base.json).
  * A config may name a ``"parent"`` config whose keys it overrides
    (resolution semantics of testbed.h:427-430: parent is loaded first,
    child keys replace recursively at top level).
  * `.ingp` / `.msgpack` files are msgpack-encoded (optionally
    zlib-wrapped for `.ingp`).
  * `find_network_config` searches alongside the requested path and in
    the installed configs/<mode> directories.
"""

from __future__ import annotations

import copy
import json
import os
import re
import zlib
from pathlib import Path
from typing import Any

import msgpack

CONFIGS_DIR = Path(__file__).resolve().parent.parent / "configs"

_COMMENT_RE = re.compile(r'("(?:[^"\\]|\\.)*")|//[^\n]*')


def _strip_comments(text: str) -> str:
    """Remove // comments outside of string literals."""
    return _COMMENT_RE.sub(lambda m: m.group(1) or "", text)


def loads_json_with_comments(text: str) -> Any:
    return json.loads(_strip_comments(text))


def load_json_file(path: str | os.PathLike) -> Any:
    path = Path(path)
    data = path.read_bytes()
    if path.suffix in (".ingp", ".msgpack"):
        if data[:2] == b"\x78\x9c" or data[:2] == b"\x78\x01" or data[:2] == b"\x78\xda" or path.suffix == ".ingp":
            try:
                data = zlib.decompress(data)
            except zlib.error:
                pass
        return msgpack.unpackb(data, raw=False, strict_map_key=False)
    return loads_json_with_comments(data.decode("utf-8"))


def find_network_config(path: str | os.PathLike, mode: str | None = None) -> Path:
    """Search-path logic of the reference (testbed.cu:254-270)."""
    path = Path(path)
    if path.exists():
        return path
    candidates = []
    if mode is not None:
        candidates.append(CONFIGS_DIR / mode / path.name)
        candidates.append(CONFIGS_DIR / mode / (path.name + ".json"))
    candidates.append(CONFIGS_DIR / path)
    for cand in candidates:
        if cand.exists():
            return cand
    raise FileNotFoundError(f"network config not found: {path}")


def load_network_config(path: str | os.PathLike, mode: str | None = None) -> dict:
    """Load a config, resolving ``"parent"`` inheritance recursively."""
    path = find_network_config(path, mode)
    config = load_json_file(path)
    if isinstance(config, dict) and "parent" in config:
        parent_path = find_network_config(Path(path).parent / config["parent"], mode)
        parent = load_network_config(parent_path, mode)
        child = {k: v for k, v in config.items() if k != "parent"}
        config = merge_parent(parent, child)
    return config


def merge_parent(parent: dict, child: dict) -> dict:
    """Child keys override parent keys (recursive dict merge)."""
    out = copy.deepcopy(parent)
    for k, v in child.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_parent(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def default_config(mode: str) -> dict:
    """Built-in default network config per mode (reference testbed.cu:4494-4521
    compiles in a default; ours loads configs/<mode>/base.json)."""
    return load_network_config(CONFIGS_DIR / mode / "base.json")

"""Native (C) runtime components, built lazily on first use.

``get_fastpack()`` compiles and loads the edge-dict packing kernel
(fastpack.c) with the host toolchain; failures fall back to the pure-Python
path silently (the packers produce identical output — tests/test_packing.py).
The built .so is cached next to the source keyed by a content hash.
"""
from __future__ import annotations

import hashlib
import importlib.util
import os
import subprocess
import sys
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_cached = None
_tried = False


def _build(src: str, tag: str) -> str | None:
    """Compile ``src`` into a cached extension .so; return its path."""
    cache_dir = os.path.join(_HERE, "_build")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"fastpack_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    include = sysconfig.get_paths()["include"]
    cc = os.environ.get("CC", "gcc")
    cmd = [
        cc, "-O2", "-shared", "-fPIC", f"-I{include}", src, "-o", so_path + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    os.replace(so_path + ".tmp", so_path)
    return so_path


def get_fastpack():
    """Return the compiled fastpack module, or None if unavailable."""
    global _cached, _tried
    if _tried:
        return _cached
    _tried = True
    if os.environ.get("VICAN_TPU_NO_NATIVE"):
        return None
    src = os.path.join(_HERE, "fastpack.c")
    try:
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:12]
        tag += f"_py{sys.version_info.major}{sys.version_info.minor}"
        so_path = _build(src, tag)
        if so_path is None:
            return None
        spec = importlib.util.spec_from_file_location("vican_tpu._native.fastpack", so_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _cached = mod
    except Exception:
        _cached = None
    return _cached

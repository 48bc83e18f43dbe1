"""Native (C) runtime components, built lazily on first use.

- ``get_fastpack()`` — edge-dict packing kernel (fastpack.c)
- ``get_fastccl()``  — connected-components + quad candidates (fastccl.c)

Modules compile with the host toolchain on first use; failures fall back to
the pure-Python paths silently (identical outputs — see tests/test_packing.py
and tests/test_detect.py).  Built .so files are cached next to the source
keyed by a content hash.  Set ``VICAN_TPU_NO_NATIVE=1`` to disable.
"""
from __future__ import annotations

import hashlib
import importlib.util
import os
import subprocess
import sys
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_cache: dict = {}


def _build(name: str) -> str | None:
    """Compile ``<name>.c`` into a content-hash-cached .so; return its path."""
    src = os.path.join(_HERE, f"{name}.c")
    # -march=native: the .so is built on the host that runs it (SIMD for the
    # integral-image sweep); flags are part of the cache tag
    flags = ["-O3", "-march=native"]
    extra_includes = []
    with open(src, "rb") as f:
        if b"numpy/arrayobject.h" in f.read():
            import numpy as np

            extra_includes.append(np.get_include())
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read() + " ".join(flags).encode()).hexdigest()[:12]
    tag += f"_py{sys.version_info.major}{sys.version_info.minor}"
    cache_dir = os.path.join(_HERE, "_build")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"{name}_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    include = sysconfig.get_paths()["include"]
    cc = os.environ.get("CC", "gcc")
    cmd = [cc, *flags, "-shared", "-fPIC", f"-I{include}",
           *(f"-I{p}" for p in extra_includes), src, "-o", so_path + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    os.replace(so_path + ".tmp", so_path)
    return so_path


def _get_module(name: str):
    if name in _cache:
        return _cache[name]
    mod = None
    if not os.environ.get("VICAN_TPU_NO_NATIVE"):
        try:
            so_path = _build(name)
            if so_path is not None:
                spec = importlib.util.spec_from_file_location(
                    f"vican_tpu._native.{name}", so_path
                )
                mod = importlib.util.module_from_spec(spec)
                spec.loader.exec_module(mod)
        except Exception:
            mod = None
    _cache[name] = mod
    return mod


def get_fastpack():
    """The compiled edge-packing module, or None if unavailable."""
    return _get_module("fastpack")


def get_fastccl():
    """The compiled CCL/quad module, or None if unavailable."""
    return _get_module("fastccl")


def get_fastthresh():
    """The compiled adaptive-threshold sweep module, or None if unavailable."""
    return _get_module("fastthresh")


# Backwards-compat for tests monkeypatching the old single-module cache.
_tried = False
_cached = None

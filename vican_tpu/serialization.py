"""Edge-dict serialization: reference ``.pt`` interchange + a native format.

The reference checkpoints its expensive perception stage with
``torch.save(edges, '<root>/cam_marker_edges.pt')`` (main.ipynb cells 3/5) and
the published datasets ship those files (README.md:18), so reading them is a
hard interchange requirement.  The pickle stream contains
``vican.geometry.SE3`` instances; :func:`load_edges` remaps that class to our
:class:`~vican_tpu.geometry.SE3` on the fly.

We also provide a native ``.npz`` format that stores the edge dict as packed
arrays — loading it avoids unpickling millions of Python objects and is an
order of magnitude faster for large graphs.
"""
from __future__ import annotations

import io
import json
import pickle

import numpy as np

from .geometry import SE3

__all__ = ["load_edges", "save_edges", "save_edges_npz", "load_edges_npz"]


class _CompatUnpickler(pickle.Unpickler):
    """Unpickler that maps reference vican classes onto ours."""

    _CLASS_MAP = {
        ("vican.geometry", "SE3"): SE3,
        ("vican_tpu.geometry", "SE3"): SE3,
    }

    def find_class(self, module, name):
        mapped = self._CLASS_MAP.get((module, name))
        if mapped is not None:
            return mapped
        return super().find_class(module, name)


class _CompatPickleModule:
    """Module-shaped shim handed to ``torch.load`` as ``pickle_module``."""

    Unpickler = _CompatUnpickler
    load = staticmethod(lambda f, **kw: _CompatUnpickler(f).load())

    @staticmethod
    def loads(data, **kw):
        return _CompatUnpickler(io.BytesIO(data)).load()


def load_edges(path: str) -> dict:
    """Load an edge dict from a reference ``.pt`` file or our ``.npz``.

    Accepts the torch-pickled format the reference datasets ship (README.md:18)
    — including ones pickled with the original ``vican`` package on the path —
    as well as :func:`save_edges_npz` output (detected by extension).
    """
    if str(path).endswith(".npz"):
        return load_edges_npz(path)
    try:
        import torch

        return torch.load(path, pickle_module=_CompatPickleModule, weights_only=False)
    except ImportError:
        # torch.save streams are zip archives with a 'data.pkl' member plus
        # storage blobs; an edge dict contains no tensors, so plain pickle of
        # the member decodes it without torch.
        import zipfile

        with zipfile.ZipFile(path) as zf:
            member = next(n for n in zf.namelist() if n.endswith("data.pkl"))
            with zf.open(member) as f:
                return _CompatUnpickler(f).load()


def save_edges(path: str, edges: dict) -> None:
    """Save an edge dict in the torch-compatible ``.pt`` pickle format."""
    import torch

    torch.save(edges, path)


def save_edges_npz(path: str, edges: dict) -> None:
    """Save an edge dict as packed arrays (fast native format)."""
    E = len(edges)
    keys_a, keys_b = [], []
    poses = np.empty((E, 4, 4), dtype=np.float32)
    corners = np.zeros((E, 4, 2), dtype=np.float32)
    errs = np.empty((E,), dtype=np.float32)
    filenames = []
    for i, (k, v) in enumerate(edges.items()):
        keys_a.append(k[0])
        keys_b.append(k[1])
        poses[i] = v["pose"].pose() if hasattr(v["pose"], "pose") else v["pose"]._pose
        if v.get("corners") is not None:
            corners[i] = np.asarray(v["corners"], dtype=np.float32).reshape(4, 2)
        errs[i] = v.get("reprojected_err", 0.0)
        filenames.append(v.get("im_filename", ""))
    np.savez_compressed(
        path,
        keys=json.dumps([keys_a, keys_b]).encode(),
        poses=poses,
        corners=corners,
        reprojected_err=errs,
        im_filenames=json.dumps(filenames).encode(),
    )


def load_edges_npz(path: str) -> dict:
    """Load the native packed format back into the reference edge-dict schema."""
    data = np.load(path, allow_pickle=False)
    keys_a, keys_b = json.loads(bytes(data["keys"]).decode())
    filenames = json.loads(bytes(data["im_filenames"]).decode())
    poses = data["poses"]
    corners = data["corners"]
    errs = data["reprojected_err"]
    out = {}
    for i, (a, b) in enumerate(zip(keys_a, keys_b)):
        out[(a, b)] = {
            "pose": SE3(pose=poses[i]),
            "corners": corners[i],
            "reprojected_err": float(errs[i]),
            "im_filename": filenames[i],
        }
    return out

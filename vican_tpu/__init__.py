"""vican_tpu — a TPU-native camera-network calibration framework.

A from-scratch JAX/XLA rebuild of the capabilities of gabmoreira/vican
(VICAN, ICRA 2024): bipartite SE(3) pose-graph synchronization for calibrating
large camera networks from ArUco-marker observations, plus the full perception
front-end (marker detection, PnP, refinement) as batched device kernels.

Public API mirrors the reference package layout:

  - :mod:`vican_tpu.geometry`    — SE3 type, SO(3) utilities, gauge alignment
  - :mod:`vican_tpu.cam`         — Camera, batched marker detection + PnP
  - :mod:`vican_tpu.dataset`     — Dataset / DojoDataset loaders
  - :mod:`vican_tpu.bipgo`       — bipartite_se3sync / object_bipartite_se3sync
  - :mod:`vican_tpu.plot`        — visualization helpers
  - :mod:`vican_tpu.evaluation`  — gauge-aligned error reports (cell 9)
  - :mod:`vican_tpu.serialization` — .pt interchange + native edge format
  - :mod:`vican_tpu.render`      — synthetic dataset renderer
  - :mod:`vican_tpu.synthetic`   — synthetic pose-graph generator
  - :mod:`vican_tpu.ops`         — the underlying device kernels
  - :mod:`vican_tpu.parallel`    — device-mesh sharded solver paths
"""

__version__ = "0.1.0"

from . import geometry  # noqa: F401

# Submodules with heavier dependencies (jax tracing, cv2) import lazily.
__all__ = [
    "geometry",
    "cam",
    "dataset",
    "bipgo",
    "plot",
    "evaluation",
    "serialization",
    "render",
    "synthetic",
    "ops",
    "parallel",
]


def __getattr__(name):
    if name in __all__:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

"""Mesh construction helpers.

The solver's scaling axis is the edge/timestep axis (SURVEY.md §5
"long-context"): the reference's analytic power-graph elimination already
reduces the optimization to the 3Cx3C camera block, so multi-chip scaling
shards the *edge list* and the T axis, combining the (small) 3Cx3C
power-graph contributions with XLA collectives over ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

EDGE_AXIS = "edges"

__all__ = ["make_mesh", "EDGE_AXIS"]


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the edge axis.

    Parameters
    ----------
    n_devices : int, optional
        Number of devices to use (defaults to all local devices).
    devices : sequence, optional
        Explicit device list (overrides ``n_devices``).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (EDGE_AXIS,))

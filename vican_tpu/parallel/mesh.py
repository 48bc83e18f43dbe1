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

__all__ = ["make_mesh", "init_distributed", "global_mesh", "EDGE_AXIS"]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host JAX distributed runtime (SURVEY.md §5).

    The reference has no distributed backend at all (single host,
    ``mp.Pool``); the TPU-native equivalent is ``jax.distributed`` — after
    this call ``jax.devices()`` spans every process's chips (ICI within a
    slice, DCN across slices) and :func:`global_mesh` builds a mesh over all
    of them for the sharded solver/perception paths.

    On TPU pods every argument is auto-detected from the environment; pass
    them explicitly for CPU/GPU clusters.  Safe to call twice (no-op when
    already initialized).  Untestable beyond the single-process virtual mesh
    in this environment — the multi-chip dry run covers the sharding program
    itself on N virtual devices.
    """
    if jax._src.distributed.global_state.client is not None:  # already up
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh() -> Mesh:
    """1-D edge-axis mesh over ALL devices of ALL processes.

    Call :func:`init_distributed` first in each process of a multi-host job;
    single-process, this is just ``make_mesh()``.
    """
    return Mesh(np.array(jax.devices()), (EDGE_AXIS,))


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

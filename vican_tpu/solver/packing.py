"""Host boundary: edge-dict <-> dense index/array bundles.

The reference keeps the pose graph as a Python dict
``{(camera_id, "<t>_<marker>"): {"pose": SE3, ...}}`` and loops over it
(reference vican/bipgo.py:203-223, 243-264, 445-469).  The TPU rebuild crosses
the string/dict world exactly once: this module evaluates the user's
``edge_filter`` / ``noise_model`` callables per edge (they are arbitrary host
Python, e.g. polygon areas — main.ipynb cells 3/7), parses the node names, and
emits static-shaped NumPy arrays + integer index vectors.  Everything after
this boundary is jittable device code (:mod:`vican_tpu.solver.core`).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

__all__ = ["PackedProblem", "pack_problem", "pack_constraints"]


@dataclass
class PackedProblem:
    """A bipartite camera<->time pose graph in array form.

    Per *filtered* edge ``e`` (camera ``cam_idx[e]`` observed marker
    ``marker_idx[e]`` at time ``time_idx[e]``):

    - ``R_e``/``t_e``: the measured camera->marker SE(3) edge pose
    - ``k_r``/``k_t``: rotation/translation noise-model weights

    Aggregation (bipgo.py:203-223 semantics: all markers seen by camera c at
    time t fold into one (c,t) edge) is precomputed as ``agg_inverse`` mapping
    edges to ``num_pairs`` unique (c,t) cells with indices ``agg_cam`` /
    ``agg_time``.
    """

    cam_ids: list[str]
    time_ids: list[str]
    marker_ids: list[str]
    # per-edge arrays (E, ...)
    R_e: np.ndarray
    t_e: np.ndarray
    k_r: np.ndarray
    k_t: np.ndarray
    cam_idx: np.ndarray
    time_idx: np.ndarray
    marker_idx: np.ndarray
    # constraints (M, ...)
    R_con: np.ndarray
    t_con: np.ndarray
    root_idx: int
    # (c,t) aggregation
    agg_inverse: np.ndarray = field(default=None)
    agg_cam: np.ndarray = field(default=None)
    agg_time: np.ndarray = field(default=None)

    @property
    def num_cams(self) -> int:
        return len(self.cam_ids)

    @property
    def num_times(self) -> int:
        return len(self.time_ids)

    @property
    def num_edges(self) -> int:
        return int(self.R_e.shape[0])

    @property
    def num_pairs(self) -> int:
        return int(self.agg_cam.shape[0])


def pack_constraints(constraints: dict) -> tuple[list[str], np.ndarray, np.ndarray, int]:
    """Constraint dict -> (marker order, R stack, t stack, root index).

    Root selection mirrors the reference exactly: ``str(min(keys))`` — a
    *lexicographic* min over the (string) keys (bipgo.py:196,411).
    """
    marker_ids = list(constraints.keys())
    root_key = str(min(marker_ids))
    order = {m: i for i, m in enumerate(marker_ids)}
    R_con = np.stack([np.asarray(constraints[m].R(), dtype=np.float64) for m in marker_ids])
    t_con = np.stack(
        [np.asarray(constraints[m].t(), dtype=np.float64).reshape(3) for m in marker_ids]
    )
    return marker_ids, R_con, t_con, order[root_key]


def pack_problem(
    src_edges: dict,
    constraints: dict,
    noise_model_r: Callable,
    noise_model_t: Callable,
    edge_filter: Callable,
) -> PackedProblem:
    """Filter + parse the edge dict into a :class:`PackedProblem`.

    Node orderings replicate the reference's ``np.unique`` over ``'c'+id`` /
    ``'t'+timestep`` prefixed names (bipgo.py:225-229), i.e. lexicographic
    order of the raw id strings — required for bit-parity of the gauge anchor
    (the eigenvector normalization pins the gauge to node 0, bipgo.py:295).
    """
    cam_set: set[str] = set()
    time_set: set[str] = set()
    kept: list[tuple[str, str, str, dict]] = []
    for (c, tm), v in src_edges.items():
        if edge_filter(v):
            t, m = tm.split("_")
            kept.append((c, t, m, v))
            cam_set.add(c)
            time_set.add(t)

    if not kept:
        raise ValueError("edge_filter removed every edge; nothing to synchronize")

    cam_ids = sorted(cam_set)
    time_ids = sorted(time_set)
    cam2idx = {c: i for i, c in enumerate(cam_ids)}
    time2idx = {t: i for i, t in enumerate(time_ids)}

    marker_ids, R_con, t_con, root_idx = pack_constraints(constraints)
    marker2idx = {m: i for i, m in enumerate(marker_ids)}

    E = len(kept)
    R_e = np.empty((E, 3, 3), dtype=np.float64)
    t_e = np.empty((E, 3), dtype=np.float64)
    k_r = np.empty((E,), dtype=np.float64)
    k_t = np.empty((E,), dtype=np.float64)
    cam_idx = np.empty((E,), dtype=np.int32)
    time_idx = np.empty((E,), dtype=np.int32)
    marker_idx = np.empty((E,), dtype=np.int32)

    for i, (c, t, m, v) in enumerate(kept):
        pose = v["pose"]
        R_e[i] = pose.R()
        t_e[i] = np.asarray(pose.t()).reshape(3)
        k_r[i] = noise_model_r(v)
        k_t[i] = noise_model_t(v)
        cam_idx[i] = cam2idx[c]
        time_idx[i] = time2idx[t]
        marker_idx[i] = marker2idx[m]

    # Unique (camera, time) cells for the constraint-folding aggregation.
    pair_key = cam_idx.astype(np.int64) * len(time_ids) + time_idx
    uniq, agg_inverse = np.unique(pair_key, return_inverse=True)
    agg_cam = (uniq // len(time_ids)).astype(np.int32)
    agg_time = (uniq % len(time_ids)).astype(np.int32)

    return PackedProblem(
        cam_ids=cam_ids,
        time_ids=time_ids,
        marker_ids=marker_ids,
        R_e=R_e,
        t_e=t_e,
        k_r=k_r,
        k_t=k_t,
        cam_idx=cam_idx,
        time_idx=time_idx,
        marker_idx=marker_idx,
        R_con=R_con,
        t_con=t_con,
        root_idx=root_idx,
        agg_inverse=agg_inverse.astype(np.int32),
        agg_cam=agg_cam,
        agg_time=agg_time,
    )

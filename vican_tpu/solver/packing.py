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

from dataclasses import dataclass
from typing import Callable

import numpy as np

__all__ = ["PackedProblem", "pack_problem", "pack_constraints"]


def _mat_to_quat(R: np.ndarray) -> np.ndarray:
    """Vectorized rotation-matrix -> quaternion (w, x, y, z), Shepperd's
    branch selection done with np.where for full batches."""
    m00, m01, m02 = R[:, 0, 0], R[:, 0, 1], R[:, 0, 2]
    m10, m11, m12 = R[:, 1, 0], R[:, 1, 1], R[:, 1, 2]
    m20, m21, m22 = R[:, 2, 0], R[:, 2, 1], R[:, 2, 2]
    tr = m00 + m11 + m22
    q = np.empty((len(R), 4), np.float64)

    # case 0: trace dominant
    s0 = np.sqrt(np.maximum(tr + 1.0, 1e-12)) * 2.0
    c0 = np.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], 1)
    # case 1: m00 dominant
    s1 = np.sqrt(np.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    c1 = np.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], 1)
    # case 2: m11 dominant
    s2 = np.sqrt(np.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2.0
    c2 = np.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], 1)
    # case 3: m22 dominant
    s3 = np.sqrt(np.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2.0
    c3 = np.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], 1)

    use0 = (tr > 0)[:, None]
    use1 = ((m00 >= m11) & (m00 >= m22))[:, None] & ~use0
    use2 = (m11 >= m22)[:, None] & ~use0 & ~use1
    q = np.where(use0, c0, np.where(use1, c1, np.where(use2, c2, c3)))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def _warn_unconstrained(n: int):
    import warnings

    warnings.warn(
        f"dropping {n} edge(s) whose marker has no constraint pose "
        "(the reference raises KeyError here — bipgo.py:209)",
        stacklevel=4,
    )


@dataclass
class PackedProblem:
    """A bipartite camera<->time pose graph in array form.

    Per *filtered* edge ``e`` (camera ``cam_idx[e]`` observed marker
    ``marker_idx[e]`` at time ``time_idx[e]``):

    - ``R_e``/``t_e``: the measured camera->marker SE(3) edge pose
    - ``k_r``/``k_t``: rotation/translation noise-model weights

    The reference's per-(c,t) aggregation (bipgo.py:215-221) needs no host
    precomputation: the device scatter-add that builds the block tensor
    accumulates duplicate (camera, time) cells.
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
    # optional compact rotation transfer (E, 4) wxyz; set when the edge
    # rotations verify as orthonormal (PnP outputs always do)
    q_e: np.ndarray | None = None
    # factor the rotation weights were divided by during f32 normalization
    # (1.0 when unnormalized); the optimality certificate threshold must be
    # divided by this to stay equivalent to the reference's absolute test
    k_r_scale: float = 1.0

    @property
    def num_cams(self) -> int:
        return len(self.cam_ids)

    @property
    def num_times(self) -> int:
        return len(self.time_ids)

    @property
    def num_edges(self) -> int:
        return int(self.R_e.shape[0])


def pack_constraints(
    constraints: dict, dtype=np.float64
) -> tuple[list[str], np.ndarray, np.ndarray, int]:
    """Constraint dict -> (marker order, R stack, t stack, root index).

    Root selection mirrors the reference exactly: ``str(min(keys))`` — a
    *lexicographic* min over the (string) keys (bipgo.py:196,411).
    """
    marker_ids = list(constraints.keys())
    root_key = str(min(marker_ids))
    order = {m: i for i, m in enumerate(marker_ids)}
    R_con = np.stack([np.asarray(constraints[m].R(), dtype=dtype) for m in marker_ids])
    t_con = np.stack(
        [np.asarray(constraints[m].t(), dtype=dtype).reshape(3) for m in marker_ids]
    )
    return marker_ids, R_con, t_con, order[root_key]


def pack_problem(
    src_edges: dict,
    constraints: dict,
    noise_model_r: Callable,
    noise_model_t: Callable,
    edge_filter: Callable,
    dtype=np.float64,
) -> PackedProblem:
    """Filter + parse the edge dict into a :class:`PackedProblem`.

    Node orderings replicate the reference's ``np.unique`` over ``'c'+id`` /
    ``'t'+timestep`` prefixed names (bipgo.py:225-229), i.e. lexicographic
    order of the raw id strings — required for bit-parity of the gauge anchor
    (the eigenvector normalization pins the gauge to node 0, bipgo.py:295).
    """
    marker_ids, R_con, t_con, root_idx = pack_constraints(constraints, dtype)
    marker2idx = {m: i for i, m in enumerate(marker_ids)}

    fastpack = None
    if np.dtype(dtype) == np.float32:
        from .._native import get_fastpack

        fastpack = get_fastpack()

    if fastpack is not None:
        # C path: filtering, key parsing and array fills run natively; only
        # the user callables execute in the interpreter.
        kept_vals, cams, times, markers, krs, kts, skipped = fastpack.pack_edges(
            src_edges, edge_filter, noise_model_r, noise_model_t, marker2idx
        )
        if skipped:
            _warn_unconstrained(skipped)
        if not kept_vals:
            raise ValueError("edge_filter removed every edge; nothing to synchronize")
        E = len(kept_vals)
        poses = [v["pose"] for v in kept_vals]
        pose44 = np.empty((E, 16), dtype=np.float32)
        fastpack.fill_f32(pose44, poses, "_pose", 16)
        pose44 = pose44.reshape(E, 4, 4)
        R_e = np.ascontiguousarray(pose44[:, :3, :3])
        t_e = np.ascontiguousarray(pose44[:, :3, 3])
        k_r = np.asarray(krs, dtype=dtype)
        k_t = np.asarray(kts, dtype=dtype)
        marker_idx = np.asarray(markers, dtype=np.int32)
    else:
        # Pure-Python path (also the float64 path); identical output —
        # tests/test_packing.py cross-checks the two.
        kept = [(k, v) for k, v in src_edges.items() if edge_filter(v)]
        n_before = len(kept)
        kept = [(k, v) for k, v in kept if k[1].split("_")[1] in marker2idx]
        if len(kept) < n_before:
            _warn_unconstrained(n_before - len(kept))
        if not kept:
            raise ValueError("edge_filter removed every edge; nothing to synchronize")
        cams = [k[0] for k, _ in kept]
        tms = [k[1].split("_") for k, _ in kept]
        times = [tm[0] for tm in tms]
        markers = [tm[1] for tm in tms]
        poses = [v["pose"] for _, v in kept]
        # Arrays are built directly in the solver dtype: host->device
        # transfers are bandwidth-bound, and a separate f64 staging pass
        # doubles both the conversion time and the bytes shipped.
        R_e = np.array([p._R for p in poses], dtype=dtype)
        t_e = np.array([p._t for p in poses], dtype=dtype).reshape(-1, 3)
        k_r = np.array([noise_model_r(v) for _, v in kept], dtype=dtype)
        k_t = np.array([noise_model_t(v) for _, v in kept], dtype=dtype)
        marker_idx = np.array([marker2idx[m] for m in markers], dtype=np.int32)

    cam_ids = sorted(set(cams))
    time_ids = sorted(set(times))
    cam2idx = {c: i for i, c in enumerate(cam_ids)}
    time2idx = {t: i for i, t in enumerate(time_ids)}
    cam_idx = np.array([cam2idx[c] for c in cams], dtype=np.int32)
    time_idx = np.array([time2idx[t] for t in times], dtype=np.int32)

    # The sync problem is well-posed only on a connected graph: each extra
    # component adds 3 kernel dimensions to the Laplacian and the primal
    # rounding (bipgo.py:295) mixes them into garbage (the reference
    # implementation NaNs out in the same situation).  Keep the largest
    # component and surface the drop.
    n_cams_all = len(cam_ids)
    n_nodes = n_cams_all + len(time_ids)
    try:
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import connected_components

        adj = coo_matrix(
            (np.ones(len(cam_idx), np.int8), (cam_idx, n_cams_all + time_idx)),
            shape=(n_nodes, n_nodes),
        )
        n_comp, roots = connected_components(adj, directed=False)
    except ImportError:  # pure-Python union-find fallback
        parent = list(range(n_nodes))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for ci, ti in zip(cam_idx, time_idx):
            ra, rb = find(int(ci)), find(n_cams_all + int(ti))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(n_nodes)])
        n_comp = len(np.unique(roots))
    del n_comp
    largest = np.bincount(roots).argmax()
    keep_edge = roots[cam_idx] == largest
    if not keep_edge.all():
        import warnings

        n_dropped_cams = int((roots[:n_cams_all] != largest).sum())
        warnings.warn(
            f"pose graph is disconnected: dropping {int((~keep_edge).sum())} edges "
            f"and {n_dropped_cams} camera node(s) outside the largest component",
            stacklevel=3,
        )
        kept = np.nonzero(keep_edge)[0]
        R_e, t_e, k_r, k_t = (a[kept] for a in (R_e, t_e, k_r, k_t))
        marker_idx = marker_idx[kept]
        kept_cam_names = [cams[i] for i in kept]
        kept_time_names = [times[i] for i in kept]
        cam_ids = sorted(set(kept_cam_names))
        time_ids = sorted(set(kept_time_names))
        cam2idx = {c: i for i, c in enumerate(cam_ids)}
        time2idx = {t: i for i, t in enumerate(time_ids)}
        cam_idx = np.array([cam2idx[c] for c in kept_cam_names], dtype=np.int32)
        time_idx = np.array([time2idx[t] for t in kept_time_names], dtype=np.int32)

    k_r_scale = 1.0
    if np.dtype(dtype) == np.float32:
        # The tutorial's noise models reach areas**6 ~ 1e16 (main.ipynb cell
        # 3); squared norms of such weights overflow float32.  The solve is
        # invariant to a global weight scale (it multiplies the Laplacian /
        # the LSQ system uniformly), so normalize to max = 1 in f32.  The
        # rotation factor is recorded so the solver's absolute optimality
        # certificate (max|eval| <= 1e-6, bipgo.py:283-284) can be rescaled
        # to fire at the same point as the reference's unnormalized test.
        m = float(np.max(np.abs(k_r))) if k_r.size else 0.0
        if m > 0:
            k_r /= m
            k_r_scale = m
        m = float(np.max(np.abs(k_t))) if k_t.size else 0.0
        if m > 0:
            k_t /= m

    # Compact rotation transfer: the host->device link is bandwidth-bound,
    # so orthonormal edge rotations ship as quaternions (4 floats vs 9).
    # The orthonormality/properness gate runs over EVERY edge — a few
    # non-orthonormal poses outside a sampled subset would otherwise be
    # silently "repaired" by the quaternion round-trip, diverging from the
    # reference (which folds the raw matrix).  The full (E,3,3) einsum is
    # negligible next to the host-link transfer it enables.
    q_e = None
    ortho = np.abs(np.einsum("eij,ekj->eik", R_e, R_e) - np.eye(3)).max()
    proper = np.linalg.det(R_e).min() > 0.5  # reflections are not rotations
    if ortho < 1e-3 and proper:
        q_e = _mat_to_quat(R_e).astype(dtype)

    return PackedProblem(
        q_e=q_e,
        k_r_scale=k_r_scale,
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
    )

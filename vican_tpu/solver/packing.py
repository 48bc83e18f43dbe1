"""Host boundary: edge-dict <-> dense index/array bundles.

The reference keeps the pose graph as a Python dict
``{(camera_id, "<t>_<marker>"): {"pose": SE3, ...}}`` and loops over it
(reference vican/bipgo.py:203-223, 243-264, 445-469).  The TPU rebuild crosses
the string/dict world exactly once: this module evaluates the user's
``edge_filter`` / ``noise_model`` callables per edge (they are arbitrary host
Python, e.g. polygon areas — main.ipynb cells 3/7), parses the node names, and
emits TWO fused static-shaped buffers — everything the device program needs
in two H2D transfers over the bandwidth/latency-bound host link:

  ``edata (E, 9)``  ``[qw qx qy qz | tx ty tz | k_r k_t]`` (solver dtype)
  ``eidx  (E, 3)``  ``[cam, time, marker]`` int32

Rotations travel as quaternions (4 floats instead of 9) whenever every edge
rotation verifies as orthonormal and proper — checked over EVERY edge; PnP
outputs always pass.  Non-orthonormal inputs fall back to shipping the raw
matrices (``R_e_raw``), faithful to the reference which folds the raw matrix.

The single-pass packer is C (:mod:`vican_tpu._native` fastpack.c) with a
pure-Python fallback producing equivalent output (tests/test_packing.py).
Everything after this boundary is jittable device code
(:mod:`vican_tpu.solver.core`).
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


def _quat_to_mat(q: np.ndarray) -> np.ndarray:
    """Host inverse of :func:`_mat_to_quat` (matches ops.lie.quat_to_mat)."""
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.empty((len(q), 3, 3), q.dtype)
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - z * w)
    R[:, 0, 2] = 2 * (x * z + y * w)
    R[:, 1, 0] = 2 * (x * y + z * w)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - x * w)
    R[:, 2, 0] = 2 * (x * z - y * w)
    R[:, 2, 1] = 2 * (y * z + x * w)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def _warn_unconstrained(n: int):
    import warnings

    warnings.warn(
        f"dropping {n} edge(s) whose marker has no constraint pose "
        "(the reference raises KeyError here — bipgo.py:209)",
        stacklevel=4,
    )


def _sorted_remap(id_list: list, prov_idx: np.ndarray) -> tuple[list, np.ndarray]:
    """Remap first-appearance-order ids/indices to lexicographic order.

    Node orderings replicate the reference's ``np.unique`` over prefixed
    names (bipgo.py:225-229) — required for bit-parity of the gauge anchor
    (the eigenvector normalization pins the gauge to node 0, bipgo.py:295).
    """
    order = sorted(range(len(id_list)), key=id_list.__getitem__)
    inv = np.empty(len(order), np.int32)
    inv[np.asarray(order, np.int32)] = np.arange(len(order), dtype=np.int32)
    return [id_list[i] for i in order], inv[prov_idx]


@dataclass
class PackedProblem:
    """A bipartite camera<->time pose graph in fused array form.

    Per *filtered* edge ``e`` (camera ``eidx[e,0]`` observed marker
    ``eidx[e,2]`` at time ``eidx[e,1]``), ``edata[e]`` holds the measured
    camera->marker rotation as a unit quaternion (wxyz), the translation, and
    the rotation/translation noise-model weights.  The reference's per-(c,t)
    aggregation (bipgo.py:215-221) needs no host precomputation: the device
    scatter-add that builds the block tensor accumulates duplicate
    (camera, time) cells.

    When the input rotations fail the orthonormality/properness gate,
    ``has_quats`` is False, the quaternion slots are unused, and the raw
    matrices ship via ``R_e_raw`` (the reference folds the raw matrix).
    """

    cam_ids: list
    time_ids: list
    marker_ids: list
    edata: np.ndarray  # (E, 9): [q(4) | t(3) | k_r | k_t]
    eidx: np.ndarray  # (E, 3) int32: [cam, time, marker]
    R_con: np.ndarray
    t_con: np.ndarray
    root_idx: int
    # factor the rotation weights were divided by during f32 normalization
    # (1.0 when unnormalized); the optimality certificate threshold must be
    # divided by this to stay equivalent to the reference's absolute test
    k_r_scale: float = 1.0
    has_quats: bool = True
    R_e_raw: np.ndarray | None = None

    # --- views over the fused buffers -----------------------------------
    @property
    def q_e(self) -> np.ndarray | None:
        return self.edata[:, :4] if self.has_quats else None

    @property
    def t_e(self) -> np.ndarray:
        return self.edata[:, 4:7]

    @property
    def k_r(self) -> np.ndarray:
        return self.edata[:, 7]

    @property
    def k_t(self) -> np.ndarray:
        return self.edata[:, 8]

    @property
    def cam_idx(self) -> np.ndarray:
        return self.eidx[:, 0]

    @property
    def time_idx(self) -> np.ndarray:
        return self.eidx[:, 1]

    @property
    def marker_idx(self) -> np.ndarray:
        return self.eidx[:, 2]

    @property
    def R_e(self) -> np.ndarray:
        """Edge rotation matrices (reconstructed from quaternions on the
        quaternion path — exact to dtype rounding; the raw array otherwise)."""
        if self.R_e_raw is None:
            self.R_e_raw = _quat_to_mat(self.edata[:, :4])
        return self.R_e_raw

    @property
    def num_cams(self) -> int:
        return len(self.cam_ids)

    @property
    def num_times(self) -> int:
        return len(self.time_ids)

    @property
    def num_edges(self) -> int:
        return int(self.edata.shape[0])


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


def _pack_python(src_edges, marker2idx, noise_model_r, noise_model_t, edge_filter, dtype):
    """Pure-Python packer (fallback; also the raw-matrix path)."""
    kept = []
    skipped = 0
    for k, v in src_edges.items():
        if not edge_filter(v):
            continue
        tm = k[1].partition("_")  # first underscore, like the C packer
        if tm[1] != "_":
            raise ValueError(f"edge key {k!r} has no '_'")
        if tm[2] not in marker2idx:
            skipped += 1
            continue
        kept.append((k[0], tm[0], tm[2], v))
    if skipped:
        _warn_unconstrained(skipped)
    if not kept:
        raise ValueError("edge_filter removed every edge; nothing to synchronize")
    poses = [v["pose"] for _, _, _, v in kept]
    E = len(kept)
    # Arrays are built directly in the solver dtype: host->device transfers
    # are bandwidth-bound, and a separate f64 staging pass doubles both the
    # conversion time and the bytes shipped.
    R_e = np.array([p._R for p in poses], dtype=dtype)
    edata = np.zeros((E, 9), dtype)
    edata[:, 4:7] = np.array([p._t for p in poses], dtype=dtype).reshape(-1, 3)
    edata[:, 7] = [noise_model_r(v) for _, _, _, v in kept]
    edata[:, 8] = [noise_model_t(v) for _, _, _, v in kept]

    ortho = np.abs(np.einsum("eij,ekj->eik", R_e, R_e) - np.eye(3)).max()
    proper = np.linalg.det(R_e).min() > 0.5  # reflections are not rotations
    has_quats = bool(ortho < 1e-3 and proper)
    if has_quats:
        edata[:, :4] = _mat_to_quat(R_e).astype(dtype)

    cam_ids, cam_idx = _sorted_remap(*_intern([c for c, _, _, _ in kept]))
    time_ids, time_idx = _sorted_remap(*_intern([t for _, t, _, _ in kept]))
    eidx = np.stack(
        [cam_idx, time_idx,
         np.array([marker2idx[m] for _, _, m, _ in kept], np.int32)], 1
    ).astype(np.int32)
    return edata, eidx, cam_ids, time_ids, has_quats, (None if has_quats else R_e)


def _intern(names: list) -> tuple[list, np.ndarray]:
    """First-appearance interning: (unique names, provisional index array)."""
    seen: dict = {}
    idx = np.empty(len(names), np.int32)
    uniq = []
    for i, s in enumerate(names):
        j = seen.get(s)
        if j is None:
            j = len(uniq)
            seen[s] = j
            uniq.append(s)
        idx[i] = j
    return uniq, idx


def pack_problem(
    src_edges: dict,
    constraints: dict,
    noise_model_r: Callable,
    noise_model_t: Callable,
    edge_filter: Callable,
    dtype=np.float64,
) -> PackedProblem:
    """Filter + parse the edge dict into a :class:`PackedProblem`."""
    dtype = np.dtype(dtype)
    marker_ids, R_con, t_con, root_idx = pack_constraints(constraints, dtype)
    marker2idx = {m: i for i, m in enumerate(marker_ids)}

    from .._native import get_fastpack

    fastpack = get_fastpack()
    packed_raw = None
    if fastpack is not None:
        # C path: one pass over the dict does filtering, key parsing, node-id
        # interning, quaternion conversion, the full orthonormality gate and
        # the fused buffer fills; only the user callables run in the
        # interpreter — and not even those when they match a recognized
        # declarative/tutorial form (solver/specs.py): the C kernel then
        # evaluates filter + noise models inline, bit-identically.
        if hasattr(fastpack, "pack_edges3"):
            from .specs import recognize_filter, recognize_noise

            (edata_b, eidx_b, raw_b, cam_list, time_list, E, skipped,
             ortho_ok) = fastpack.pack_edges3(
                src_edges, edge_filter, noise_model_r, noise_model_t,
                marker2idx, dtype == np.float64,
                recognize_filter(edge_filter),
                recognize_noise(noise_model_r),
                recognize_noise(noise_model_t),
            )
        else:
            (edata_b, eidx_b, raw_b, cam_list, time_list, E, skipped,
             ortho_ok) = fastpack.pack_edges2(
                src_edges, edge_filter, noise_model_r, noise_model_t,
                marker2idx, dtype == np.float64,
            )
        if skipped:
            _warn_unconstrained(skipped)
        if E == 0:
            raise ValueError("edge_filter removed every edge; nothing to synchronize")
        edata = np.frombuffer(edata_b, dtype=dtype).reshape(E, 9)
        eidx = np.frombuffer(eidx_b, dtype=np.int32).reshape(E, 3)
        cam_ids, eidx[:, 0] = _sorted_remap(cam_list, eidx[:, 0])
        time_ids, eidx[:, 1] = _sorted_remap(time_list, eidx[:, 1])
        if ortho_ok:
            packed_raw = (edata, eidx, cam_ids, time_ids, True, None)
        else:
            # Non-orthonormal rotations: ship the raw matrices (the
            # reference folds the raw matrix, bipgo.py:209-213).  The C
            # pass emitted them alongside the quats, so the user callables
            # (which may be stateful) are NOT re-invoked.
            R_e_raw = np.frombuffer(raw_b, np.float64).reshape(E, 3, 3).astype(dtype)
            edata[:, :4] = 0.0  # quat slots are unused on this path
            packed_raw = (edata, eidx, cam_ids, time_ids, False, R_e_raw)
    if packed_raw is None:
        packed_raw = _pack_python(
            src_edges, marker2idx, noise_model_r, noise_model_t, edge_filter, dtype
        )
    edata, eidx, cam_ids, time_ids, has_quats, R_e_raw = packed_raw

    # The sync problem is well-posed only on a connected graph: each extra
    # component adds 3 kernel dimensions to the Laplacian and the primal
    # rounding (bipgo.py:295) mixes them into garbage (the reference
    # implementation NaNs out in the same situation).  Keep the largest
    # component and surface the drop.
    n_cams_all = len(cam_ids)
    n_nodes = n_cams_all + len(time_ids)
    cam_idx = eidx[:, 0]
    time_idx = eidx[:, 1]
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
        edata = edata[kept]
        eidx = eidx[kept]
        if R_e_raw is not None:
            R_e_raw = R_e_raw[kept]
        # compress node indices; np.unique preserves the lexicographic order
        # of the surviving ids (they were sorted already)
        used_c = np.unique(eidx[:, 0])
        remap_c = np.full(n_cams_all, -1, np.int32)
        remap_c[used_c] = np.arange(len(used_c), dtype=np.int32)
        eidx[:, 0] = remap_c[eidx[:, 0]]
        cam_ids = [cam_ids[i] for i in used_c]
        used_t = np.unique(eidx[:, 1])
        remap_t = np.full(len(time_ids), -1, np.int32)
        remap_t[used_t] = np.arange(len(used_t), dtype=np.int32)
        eidx[:, 1] = remap_t[eidx[:, 1]]
        time_ids = [time_ids[i] for i in used_t]

    k_r_scale = 1.0
    if dtype == np.float32:
        # The tutorial's noise models reach areas**6 ~ 1e16 (main.ipynb cell
        # 3); squared norms of such weights overflow float32.  The solve is
        # invariant to a global weight scale (it multiplies the Laplacian /
        # the LSQ system uniformly), so normalize to max = 1 in f32.
        m = float(np.max(np.abs(edata[:, 7]))) if len(edata) else 0.0
        if m > 0:
            edata[:, 7] /= m
            k_r_scale = m
        m = float(np.max(np.abs(edata[:, 8]))) if len(edata) else 0.0
        if m > 0:
            edata[:, 8] /= m

    return PackedProblem(
        cam_ids=cam_ids,
        time_ids=time_ids,
        marker_ids=marker_ids,
        edata=edata,
        eidx=eidx,
        R_con=R_con,
        t_con=t_con,
        root_idx=root_idx,
        k_r_scale=k_r_scale,
        has_quats=has_quats,
        R_e_raw=R_e_raw,
    )

"""Host float64 translation solve (small-problem fallback).

The reference runs object calibration in float64 (main.ipynb cell 3); its
``area**6`` translation weights span ~6 orders of magnitude, which the
float32 normal equations cannot resolve (squaring the weights exceeds f32's
~7 digits).  When the caller requests float64 but the device computes f32
(TPU), this module solves the translation stage on the host in NumPy f64 —
the system is tiny for the problems that use such weights (thousands of
edges), so this costs milliseconds while restoring reference-grade accuracy.

Math identical to :func:`vican_tpu.solver.core.translation_rhs` +
``solve_translations_cg``/``lsqr`` (reference bipgo.py:434-481).
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["solve_translations_host", "host_f64_enabled"]

# Above this edge count the host solve is no longer "free" (noted in the
# phase log); the solvers are iterative LinearOperator cg/lsqr with O(E)
# memory, so an explicit float64 request is honored at ANY size — the
# reference would honor it too (slowly, on CPU).  Set
# VICAN_TPU_MAX_HOST_EDGES to cap the host solve and accept the device-f32
# downgrade past the cap instead.
MAX_HOST_EDGES = 200_000


def host_f64_enabled(num_edges: int) -> bool:
    """Whether an f64-requested translation solve runs on the host at this
    size (always, unless the user capped it via VICAN_TPU_MAX_HOST_EDGES)."""
    raw = os.environ.get("VICAN_TPU_MAX_HOST_EDGES", "0")
    try:
        cap = int(raw)
    except ValueError:
        import warnings

        warnings.warn(
            f"ignoring malformed VICAN_TPU_MAX_HOST_EDGES={raw!r} "
            "(expected an integer)"
        )
        cap = 0
    return cap <= 0 or num_edges <= cap


def solve_translations_host(packed, r_cam, r_time, lsqr_solver: str):
    """Solve the weighted incidence LSQ in float64 on the host.

    ``r_cam``/``r_time``: world-frame rotations from the device SO(3) stage.
    Returns ``(t_est (C+T, 3) float64, rel_residual)``.
    """
    C, T = packed.num_cams, packed.num_times
    k_t = np.asarray(packed.k_t, np.float64)
    cam_idx = np.asarray(packed.cam_idx)
    time_idx = np.asarray(packed.time_idx)
    R_con = np.asarray(packed.R_con, np.float64)
    t_con = np.asarray(packed.t_con, np.float64)
    r_cam = np.asarray(r_cam, np.float64)
    r_time = np.asarray(r_time, np.float64)
    t_e = np.asarray(packed.t_e, np.float64)
    m = np.asarray(packed.marker_idx)

    R0 = R_con[packed.root_idx]
    t0 = t_con[packed.root_idx]
    Rm = R_con[m]
    tm = t_con[m]
    r0m = np.einsum("ji,ejk->eik", R0, Rm)
    tm0 = np.einsum("eji,ej->ei", Rm, t0 - tm)
    t_tilde = k_t[:, None] * (
        np.einsum("eij,ej->ei", r_cam[cam_idx], t_e)
        + np.einsum("eij,ejk,ek->ei", r_time[time_idx], r0m, tm0)
    )

    N = C + T

    def A_mv(x):
        x = x.reshape(N, 3)
        return (k_t[:, None] * (x[C:][time_idx] - x[:C][cam_idx])).reshape(-1)

    def At_mv(y):
        y = y.reshape(-1, 3)
        ky = k_t[:, None] * y
        out = np.zeros((N, 3))
        np.add.at(out[:C], cam_idx, -ky)
        np.add.at(out[C:], time_idx, ky)
        return out.reshape(-1)

    b = At_mv(t_tilde.reshape(-1))
    try:
        from scipy.sparse.linalg import LinearOperator, cg, lsqr

        E3 = 3 * len(k_t)
        A_op = LinearOperator((E3, 3 * N), matvec=A_mv, rmatvec=At_mv)
        if lsqr_solver == "direct":
            x = lsqr(A_op, t_tilde.reshape(-1))[0]
        else:
            AtA = LinearOperator(
                (3 * N, 3 * N), matvec=lambda v: At_mv(A_mv(v))
            )
            x, _ = cg(AtA, b)
    except ImportError:  # plain-NumPy CG fallback
        x = np.zeros(3 * N)
        r = b - At_mv(A_mv(x))
        p = r.copy()
        rs = r @ r
        for _ in range(10 * N):
            Ap = At_mv(A_mv(p))
            alpha = rs / max(p @ Ap, 1e-300)
            x += alpha * p
            r -= alpha * Ap
            rs_new = r @ r
            if np.sqrt(rs_new) <= 1e-5 * np.linalg.norm(b):
                break
            p = r + (rs_new / max(rs, 1e-300)) * p
            rs = rs_new

    res = np.linalg.norm(At_mv(A_mv(x)) - b) / max(np.linalg.norm(b), 1e-300)
    return x.reshape(N, 3), float(res)

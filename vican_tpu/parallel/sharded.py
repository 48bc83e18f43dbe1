"""Multi-chip sharded solver.

Strategy (the TPU-native replacement for the reference's single-host SciPy
pipeline — see SURVEY.md §2.3):

- Per-edge arrays are sharded across the mesh's ``"edges"`` axis; camera
  state (r_c, Lambda_C, the 3Cx3C power graph and its eigendecomposition) is
  replicated — it is tiny by design, that is the whole point of the
  power-graph elimination.
- The block tensor ``B`` scatter and the T-axis intermediates partition over
  the mesh; the power-graph contraction becomes a local einsum plus an
  all-reduce of 3Cx3C partials over ICI.
- Time-node state (Lambda_T blocks, r_t) and the per-time 3x3 SVDs are
  embarrassingly parallel on the T axis.
- The translation CG shards the per-edge matvec terms; camera-node segments
  all-reduce.

Implementation uses ``jit`` with explicit ``NamedSharding`` on the inputs,
letting XLA (GSPMD) place the collectives.  This reuses
:mod:`vican_tpu.solver.core` unchanged — the solver is written
shape-statically, so the sharded build is the same program partitioned
differently.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..solver import core
from .mesh import EDGE_AXIS

__all__ = ["so3_sync_sharded", "se3sync_sharded", "pad_to_multiple"]


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0, fill=0):
    """Pad ``arr`` along ``axis`` to the next multiple (shard-evenness)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, rem)
    return np.pad(arr, widths, constant_values=fill)


def _put(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


def _shard_edges(packed, mesh, dtype):
    """Pad per-edge arrays to the mesh size and place them sharded.

    Zero-weight padding edges contribute nothing to any scatter-add, so
    correctness is unaffected (k_r = k_t = 0, R_e = 0).
    """
    n = mesh.devices.size
    return dict(
        R_e=_put(mesh, pad_to_multiple(np.asarray(packed.R_e, dtype), n), P(EDGE_AXIS, None, None)),
        t_e=_put(mesh, pad_to_multiple(np.asarray(packed.t_e, dtype), n), P(EDGE_AXIS, None)),
        k_r=_put(mesh, pad_to_multiple(np.asarray(packed.k_r, dtype), n), P(EDGE_AXIS)),
        k_t=_put(mesh, pad_to_multiple(np.asarray(packed.k_t, dtype), n), P(EDGE_AXIS)),
        cam_idx=_put(mesh, pad_to_multiple(np.asarray(packed.cam_idx, np.int32), n), P(EDGE_AXIS)),
        time_idx=_put(mesh, pad_to_multiple(np.asarray(packed.time_idx, np.int32), n), P(EDGE_AXIS)),
        marker_idx=_put(mesh, pad_to_multiple(np.asarray(packed.marker_idx, np.int32), n), P(EDGE_AXIS)),
        R_con=jnp.asarray(packed.R_con, dtype),
        t_con=jnp.asarray(packed.t_con, dtype),
    )


def so3_sync_sharded(KR, k_r, cam_idx, time_idx, *, C, T, maxiter, mesh, dtype=np.float32):
    """Sharded SO(3) sync: edges sharded, camera block replicated."""
    n = mesh.devices.size
    KR = pad_to_multiple(np.asarray(KR, dtype), n)
    k_r = pad_to_multiple(np.asarray(k_r, dtype), n)
    cam_idx = pad_to_multiple(np.asarray(cam_idx, np.int32), n)
    time_idx = pad_to_multiple(np.asarray(time_idx, np.int32), n)

    with jax.default_matmul_precision("highest"):
        with mesh:
            return core.so3_sync(
                _put(mesh, KR, P(EDGE_AXIS, None, None)),
                _put(mesh, k_r, P(EDGE_AXIS)),
                _put(mesh, cam_idx, P(EDGE_AXIS)),
                _put(mesh, time_idx, P(EDGE_AXIS)),
                C=C,
                T=T,
                maxiter=jnp.asarray(maxiter, jnp.int32),
            )


def se3sync_sharded(packed, *, maxiter, mesh, dtype=np.float32, lsqr_solver="conjugate_gradient"):
    """Full sharded SE(3) sync from a :class:`PackedProblem`.

    Returns ``(r_cam, r_time, t_est, cg_residual)`` as host arrays (cameras
    first in ``t_est``, then time nodes — same layout as the single-chip
    path).
    """
    C, T = packed.num_cams, packed.num_times
    arrs = _shard_edges(packed, mesh, dtype)

    with jax.default_matmul_precision("highest"):
        with mesh:
            if lsqr_solver == "conjugate_gradient":
                result, poses44, res = core.se3sync_full(
                    arrs["R_e"], arrs["t_e"], arrs["k_r"], arrs["k_t"],
                    arrs["cam_idx"], arrs["time_idx"], arrs["marker_idx"],
                    arrs["R_con"], arrs["t_con"],
                    root_idx=packed.root_idx, C=C, T=T,
                    maxiter=jnp.asarray(maxiter, jnp.int32),
                )
                t_est = poses44[:, :3, 3]
            else:
                KR = core.fold_constraints(
                    arrs["R_e"], arrs["k_r"], arrs["marker_idx"], arrs["R_con"],
                    packed.root_idx,
                )
                result = core.so3_sync(
                    KR, arrs["k_r"], arrs["cam_idx"], arrs["time_idx"],
                    C=C, T=T, maxiter=jnp.asarray(maxiter, jnp.int32),
                )
                t_tilde = core.translation_rhs(
                    result.r_cam.astype(dtype), result.r_time.astype(dtype),
                    arrs["t_e"], arrs["k_t"], arrs["cam_idx"], arrs["time_idx"],
                    arrs["marker_idx"], arrs["R_con"], arrs["t_con"], packed.root_idx,
                )
                t_est, res = core.solve_translations_lsqr(
                    t_tilde, arrs["k_t"], arrs["cam_idx"], arrs["time_idx"], C=C, T=T
                )

    return np.asarray(result.r_cam), np.asarray(result.r_time), np.asarray(t_est), float(res)

"""Multi-chip sharded solver.

Strategy (the TPU-native replacement for the reference's single-host SciPy
pipeline — see SURVEY.md §2.3):

- Edge/pair arrays are sharded across the mesh's ``"edges"`` axis; camera
  state (r_c, Lambda_C, the 3Cx3C power graph and its eigendecomposition) is
  replicated — it is tiny by design, that is the whole point of the
  power-graph elimination.
- The block tensor ``B3`` is sharded over the T (timestep) axis, so each chip
  holds only its slice of the big axis; the power-graph contraction becomes a
  local einsum plus an all-reduce (``psum``) of 3Cx3C partials over ICI.
- Time-node state (Lambda_T blocks, r_t) stays sharded over T; the per-time
  3x3 SVDs are embarrassingly parallel on the sharded axis.
- The translation CG shards the per-edge matvec terms and the time-node block
  of the solution; camera-node segments all-reduce.

Implementation uses ``jit`` with explicit ``NamedSharding`` on inputs plus
``with_sharding_constraint`` on the big intermediates, letting XLA place the
collectives (GSPMD).  This reuses :mod:`vican_tpu.solver.core` unchanged —
the solver is written shape-statically, so the sharded build is the same
program partitioned differently.
"""
from __future__ import annotations

from functools import partial

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


def so3_sync_sharded(M, W, pair_cam, pair_time, *, C, T, maxiter, mesh, dtype=np.float32):
    """Sharded SO(3) sync: edges sharded, camera block replicated.

    Padding: edge arrays are padded with zero weights/blocks (a zero edge
    contributes nothing to any segment sum), T is left as-is (the scatter
    target is sharded by constraint inside the jitted program).
    """
    n = mesh.devices.size
    M = pad_to_multiple(np.asarray(M, dtype), n)
    W = pad_to_multiple(np.asarray(W, dtype), n)
    pair_cam = pad_to_multiple(np.asarray(pair_cam, np.int32), n)
    pair_time = pad_to_multiple(np.asarray(pair_time, np.int32), n)

    with jax.default_matmul_precision("highest"):
        with mesh:
            result = core.so3_sync(
                _put(mesh, M, P(EDGE_AXIS, None, None)),
                _put(mesh, W, P(EDGE_AXIS)),
                _put(mesh, pair_cam, P(EDGE_AXIS)),
                _put(mesh, pair_time, P(EDGE_AXIS)),
                C=C,
                T=T,
                maxiter=jnp.asarray(maxiter, jnp.int32),
            )
    return result


def se3sync_sharded(packed, *, maxiter, mesh, dtype=np.float32, lsqr_solver="conjugate_gradient"):
    """Full sharded SE(3) sync from a :class:`PackedProblem`.

    Returns ``(r_cam, r_time, t_est)`` as host arrays (cameras first in
    ``t_est``, then time nodes — same layout as the single-chip path).
    """
    from ..solver.core import fold_constraints, translation_rhs

    n = mesh.devices.size
    C, T = packed.num_cams, packed.num_times

    R_e = pad_to_multiple(np.asarray(packed.R_e, dtype), n)
    k_r = pad_to_multiple(np.asarray(packed.k_r, dtype), n)
    marker_idx = pad_to_multiple(np.asarray(packed.marker_idx, np.int32), n)
    agg_inverse = pad_to_multiple(np.asarray(packed.agg_inverse, np.int32), n)

    with jax.default_matmul_precision("highest"):
        with mesh:
            M, W = fold_constraints(
                _put(mesh, R_e, P(EDGE_AXIS, None, None)),
                _put(mesh, k_r, P(EDGE_AXIS)),
                _put(mesh, marker_idx, P(EDGE_AXIS)),
                jnp.asarray(packed.R_con, dtype),
                packed.root_idx,
                _put(mesh, agg_inverse, P(EDGE_AXIS)),
                packed.num_pairs,
            )
            result = so3_sync_sharded(
                np.asarray(M), np.asarray(W), packed.agg_cam, packed.agg_time,
                C=C, T=T, maxiter=maxiter, mesh=mesh, dtype=dtype,
            )

            k_t = _put(mesh, pad_to_multiple(np.asarray(packed.k_t, dtype), n), P(EDGE_AXIS))
            cam_idx = _put(mesh, pad_to_multiple(np.asarray(packed.cam_idx, np.int32), n), P(EDGE_AXIS))
            time_idx = _put(mesh, pad_to_multiple(np.asarray(packed.time_idx, np.int32), n), P(EDGE_AXIS))
            t_e = _put(mesh, pad_to_multiple(np.asarray(packed.t_e, dtype), n), P(EDGE_AXIS, None))
            m_idx = _put(mesh, marker_idx, P(EDGE_AXIS))

            t_tilde = translation_rhs(
                result.r_cam.astype(dtype),
                result.r_time.astype(dtype),
                t_e,
                k_t,
                cam_idx,
                time_idx,
                m_idx,
                jnp.asarray(packed.R_con, dtype),
                jnp.asarray(packed.t_con, dtype),
                packed.root_idx,
            )
            if lsqr_solver == "conjugate_gradient":
                t_est, res = core.solve_translations_cg(t_tilde, k_t, cam_idx, time_idx, C=C, T=T)
            else:
                t_est, res = core.solve_translations_lsqr(t_tilde, k_t, cam_idx, time_idx, C=C, T=T)

    return np.asarray(result.r_cam), np.asarray(result.r_time), np.asarray(t_est), float(res)

"""Bipartite pose-graph optimization — public API.

Drop-in equivalents of the reference entry points (vican/bipgo.py):

- :func:`bipartite_se3sync`        (bipgo.py:353-490)
- :func:`object_bipartite_se3sync` (bipgo.py:493-545)
- :func:`large_bipartite_so3sync`  (bipgo.py:145-350)
- :func:`bipartite_so3sync`        (alias; the reference's small-graph variant
  at bipgo.py:18-142 is dead code with a conflicting constraint convention —
  the live power-graph math is canonical, see SURVEY.md §2 #10)

Same edge-dict schema, same callable hooks (``noise_model_r/t``,
``edge_filter`` evaluated per edge on the host), same output conventions
(world-frame poses keyed by camera id and ``"<t>_0"``).  The compute runs as
one fused jitted program on the accelerator; see
:mod:`vican_tpu.solver.core` for the TPU-native redesign notes.
"""
from __future__ import annotations

import warnings
from typing import Callable

import numpy as np

from .geometry import SE3
from .solver import core as _core
from .solver.packing import PackedProblem, pack_problem
from .utils.timing import PhaseTimer

__all__ = [
    "bipartite_se3sync",
    "object_bipartite_se3sync",
    "large_bipartite_so3sync",
    "bipartite_so3sync",
]


def _solver_dtype(dtype):
    """Resolve the requested dtype against backend capabilities.

    The reference runs object calibration in float64 (main.ipynb cell 3).
    TPUs have no native f64; if x64 is unavailable we compute in f32 and warn
    (the HIGHEST-precision eigensolve keeps f32 within the 1e-3 parity target
    — see tests/test_solver.py).
    """
    import jax

    dtype = np.dtype(dtype)
    if dtype == np.float64 and not jax.config.jax_enable_x64:
        warnings.warn(
            "float64 requested but jax x64 is disabled (TPU default); "
            "computing in float32. Call jax.config.update('jax_enable_x64', True) "
            "on a CPU backend for full f64.",
            stacklevel=3,
        )
        return np.dtype(np.float32)
    return dtype


def _device_arrays(packed: PackedProblem, dtype):
    import jax.numpy as jnp

    # quaternion transfer when available: 4 floats/edge instead of 9 over
    # the bandwidth-bound host link; reconstructed on device
    rot = packed.q_e if packed.q_e is not None else packed.R_e
    return dict(
        R_e=jnp.asarray(rot, dtype),
        t_e=jnp.asarray(packed.t_e, dtype),
        k_r=jnp.asarray(packed.k_r, dtype),
        k_t=jnp.asarray(packed.k_t, dtype),
        cam_idx=jnp.asarray(packed.cam_idx),
        time_idx=jnp.asarray(packed.time_idx),
        marker_idx=jnp.asarray(packed.marker_idx),
        R_con=jnp.asarray(packed.R_con, dtype),
        t_con=jnp.asarray(packed.t_con, dtype),
    )


def large_bipartite_so3sync(
    src_edges: dict,
    constraints: dict,
    noise_model: Callable,
    edge_filter: Callable,
    maxiter: int,
    dtype=np.float32,
    verbose: bool = True,
) -> dict:
    """SO(3) synchronization in large bipartite graphs with node constraints.

    Primal-dual iteration over the camera power graph (VICAN).  Edge keys are
    ``(camera_id, "<t>_<marker>")`` tuples; values carry at least ``"pose"``
    (an SE3 whose rotation is camera->marker).  Returns world-frame rotations
    keyed by camera id and ``"<t>_0"``.
    """
    import jax
    import jax.numpy as jnp

    dtype = _solver_dtype(dtype)
    tm = PhaseTimer(verbose=verbose)
    tm.log(
        "Received graph with {} nodes {} edges".format(
            len({n for e in src_edges for n in e}), len(src_edges)
        )
    )
    with tm.phase("Applying constraints"):
        packed = pack_problem(
            src_edges, constraints, noise_model, lambda e: 1.0, edge_filter, dtype=dtype
        )
    tm.log(
        "Bipartite graph: {} cameras, {} timesteps, {} edges.".format(
            packed.num_cams, packed.num_times, packed.num_edges
        )
    )
    arrs = _device_arrays(packed, dtype)
    with tm.phase("Optimizing") as ev:
        with jax.default_matmul_precision("highest"):
            KR = _core.fold_constraints(
                arrs["R_e"], arrs["k_r"], arrs["marker_idx"], arrs["R_con"], packed.root_idx
            )
            result = _core.so3_sync(
                KR, arrs["k_r"], arrs["cam_idx"], arrs["time_idx"],
                C=packed.num_cams, T=packed.num_times,
                maxiter=jnp.asarray(maxiter, jnp.int32),
            )
        ev["sync"] = result
    if verbose:
        tm.log(
            "Iterations: {}  evals: {}  eigengap: {:1.3e}".format(
                int(result.num_iters), np.asarray(result.evals), float(result.eigengap)
            )
        )

    r_cam = np.asarray(result.r_cam)
    r_time = np.asarray(result.r_time)
    out = {}
    for i, c in enumerate(packed.cam_ids):
        out[c] = r_cam[i]
    for j, t in enumerate(packed.time_ids):
        out[t + "_0"] = r_time[j]
    return out


# The reference's non-power-graph variant (bipgo.py:18-142) is unused dead
# code with an inconsistent folding convention; we expose the name for API
# compatibility, backed by the canonical algorithm.
bipartite_so3sync = large_bipartite_so3sync


def bipartite_se3sync(
    src_edges: dict,
    constraints: dict,
    noise_model_r: Callable,
    noise_model_t: Callable,
    edge_filter: Callable,
    maxiter: int,
    lsqr_solver: str = "conjugate_gradient",
    dtype=np.float32,
    verbose: bool = True,
) -> dict:
    """SE(3) synchronization in large bipartite graphs with node constraints.

    Rotation stage via the power-graph primal-dual sync; translations from a
    weighted incidence least-squares system solved matrix-free on device
    (``lsqr_solver``: ``"conjugate_gradient"`` for CG on the normal equations,
    ``"direct"`` for LSQR — both iterative, mirroring bipgo.py:476-480).
    Returns ``{node: SE3}`` world-frame poses for cameras and ``"<t>_0"``
    object nodes.
    """
    import jax
    import jax.numpy as jnp

    requested = np.dtype(dtype)
    dtype = _solver_dtype(dtype)
    tm = PhaseTimer(verbose=verbose)
    tm.log(
        "Received graph with {} nodes {} edges".format(
            len({n for e in src_edges for n in e}), len(src_edges)
        )
    )
    with tm.phase("Applying constraints"):
        packed = pack_problem(
            src_edges, constraints, noise_model_r, noise_model_t, edge_filter, dtype=dtype
        )
    tm.log(
        "Bipartite graph: {} cameras, {} timesteps, {} edges.".format(
            packed.num_cams, packed.num_times, packed.num_edges
        )
    )

    arrs = _device_arrays(packed, dtype)
    C, T = packed.num_cams, packed.num_times

    # Reference-grade f64: when the caller asked for float64 but the device
    # computes f32 (TPU), the translation stage runs on the host in f64 —
    # extreme noise-model weight ranges (area**6 spans ~1e-6..1, main.ipynb
    # cell 3) are unresolvable in f32 normal equations.  Rotations stay on
    # device (f32 with HIGHEST matmuls matches f64 — tests/test_solver.py).
    from .solver.host_fallback import MAX_HOST_EDGES, solve_translations_host

    host_f64_translations = (
        requested == np.float64
        and dtype != np.float64
        and packed.num_edges <= MAX_HOST_EDGES
    )

    if host_f64_translations:
        with tm.phase("Optimizing (device) + solving (host f64)") as ev:
            with jax.default_matmul_precision("highest"):
                KR = _core.fold_constraints(
                    arrs["R_e"], arrs["k_r"], arrs["marker_idx"], arrs["R_con"],
                    packed.root_idx,
                )
                result = _core.so3_sync(
                    KR, arrs["k_r"], arrs["cam_idx"], arrs["time_idx"],
                    C=C, T=T, maxiter=jnp.asarray(maxiter, jnp.int32),
                )
            r_cam = np.asarray(result.r_cam)
            r_time = np.asarray(result.r_time)
            t_est, res = solve_translations_host(packed, r_cam, r_time, lsqr_solver)
            ev["sync"] = result
        if verbose:
            tm.log(
                "Iterations: {}  evals: {}  eigengap: {:1.3e}".format(
                    int(result.num_iters), np.asarray(result.evals), float(result.eigengap)
                )
            )
        if res > 1e-3:
            warnings.warn(f"translation solve residual {res:.3e} (poorly converged)")
        out = {}
        for i, c in enumerate(packed.cam_ids):
            out[c] = SE3(R=r_cam[i], t=t_est[i])
        for j, t in enumerate(packed.time_ids):
            out[t + "_0"] = SE3(R=r_time[j], t=t_est[C + j])
        tm.log("Done!")
        return out

    with tm.phase("Optimizing + solving (fused device program)") as ev:
        with jax.default_matmul_precision("highest"):
            poses44 = None
            if lsqr_solver == "conjugate_gradient":
                result, poses44, res = _core.se3sync_full(
                    arrs["R_e"], arrs["t_e"], arrs["k_r"], arrs["k_t"],
                    arrs["cam_idx"], arrs["time_idx"], arrs["marker_idx"],
                    arrs["R_con"], arrs["t_con"],
                    root_idx=packed.root_idx, C=C, T=T,
                    maxiter=jnp.asarray(maxiter, jnp.int32),
                )
            elif lsqr_solver == "direct":
                KR = _core.fold_constraints(
                    arrs["R_e"], arrs["k_r"], arrs["marker_idx"], arrs["R_con"],
                    packed.root_idx,
                )
                result = _core.so3_sync(
                    KR, arrs["k_r"], arrs["cam_idx"], arrs["time_idx"],
                    C=C, T=T, maxiter=jnp.asarray(maxiter, jnp.int32),
                )
                t_tilde = _core.translation_rhs(
                    result.r_cam.astype(dtype), result.r_time.astype(dtype),
                    arrs["t_e"], arrs["k_t"], arrs["cam_idx"], arrs["time_idx"],
                    arrs["marker_idx"], arrs["R_con"], arrs["t_con"], packed.root_idx,
                )
                t_est, res = _core.solve_translations_lsqr(
                    t_tilde, arrs["k_t"], arrs["cam_idx"], arrs["time_idx"], C=C, T=T
                )
            else:
                raise ValueError(f"unknown lsqr_solver: {lsqr_solver!r}")
        ev["sync"] = (result, poses44 if poses44 is not None else t_est)
    if verbose:
        tm.log(
            "Iterations: {}  evals: {}  eigengap: {:1.3e}".format(
                int(result.num_iters), np.asarray(result.evals), float(result.eigengap)
            )
        )
    res = float(res)
    if res > 1e-3:
        warnings.warn(f"translation solve residual {res:.3e} (poorly converged)")

    out = {}
    if poses44 is not None:
        poses44 = np.asarray(poses44)
        # zero-copy views keep the solver dtype (a float32 cast through the
        # pose= ctor would cap rotation accuracy at ~0.02 deg via arccos
        # cancellation) and skip 10k+ per-node allocations.
        from_pose = SE3._from_pose_view
        for i, c in enumerate(packed.cam_ids):
            out[c] = from_pose(poses44[i])
        for j, t in enumerate(packed.time_ids):
            out[t + "_0"] = from_pose(poses44[C + j])
    else:
        r_cam = np.asarray(result.r_cam)
        r_time = np.asarray(result.r_time)
        t_est = np.asarray(t_est)
        for i, c in enumerate(packed.cam_ids):
            out[c] = SE3(R=r_cam[i], t=t_est[i])
        for j, t in enumerate(packed.time_ids):
            out[t + "_0"] = SE3(R=r_time[j], t=t_est[C + j])
    tm.log("Done!")
    return out


def object_bipartite_se3sync(
    src_edges: dict,
    noise_model_r: Callable,
    noise_model_t: Callable,
    edge_filter: Callable,
    maxiter: int,
    lsqr_solver: str = "conjugate_gradient",
    dtype=np.float32,
    verbose: bool = True,
) -> dict:
    """Calibrate a marker object from a single static camera.

    Re-keys edges so markers play the "camera" role and each frame the
    "time" role, with inverted poses (bipgo.py:524-531), then runs
    :func:`bipartite_se3sync` with an identity constraint on the lowest
    marker id.  Returns only the marker poses (keys without ``"_"``), in the
    root-marker frame.
    """
    edges = {}
    root = str(min(int(e[1].split("_")[1]) for e in src_edges))
    for (t_key, tm_key), v in src_edges.items():
        t, marker_id = tm_key.split("_")
        new_v = dict(v)
        new_v["pose"] = v["pose"].inv()
        edges[(marker_id, t + "_" + root)] = new_v

    out = bipartite_se3sync(
        edges,
        constraints={root: SE3(pose=np.eye(4))},
        noise_model_r=noise_model_r,
        noise_model_t=noise_model_t,
        edge_filter=edge_filter,
        maxiter=maxiter,
        lsqr_solver=lsqr_solver,
        dtype=dtype,
        verbose=verbose,
    )
    return {k: v for k, v in out.items() if "_" not in k}

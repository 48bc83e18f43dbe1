"""Bipartite pose-graph optimization — public API.

Drop-in equivalents of the reference entry points (vican/bipgo.py):

- :func:`bipartite_se3sync`        (bipgo.py:353-490)
- :func:`object_bipartite_se3sync` (bipgo.py:493-545)
- :func:`large_bipartite_so3sync`  (bipgo.py:145-350)
- :func:`bipartite_so3sync`        (bipgo.py:18-142 — the small-graph
  variant, faithfully ported with its OWN conventions; note the reference
  never calls it and its folding convention conflicts with the live
  algorithm's, see SURVEY.md §2 #10)

Same edge-dict schema, same callable hooks (``noise_model_r/t``,
``edge_filter`` evaluated per edge on the host), same output conventions
(world-frame poses keyed by camera id and ``"<t>_0"``).  The compute runs as
one fused jitted program on the accelerator; see
:mod:`vican_tpu.solver.core` for the TPU-native redesign notes.
"""
from __future__ import annotations

import os
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


def _log_sync_result(tm: PhaseTimer, result) -> None:
    """Per-iteration diagnostics, comparable to the reference's tqdm postfix
    (bipgo.py:336-340: eigenvalues + eigengap every primal-dual iteration),
    followed by the final summary line."""
    n = int(result.num_iters)
    if result.evals_hist is not None:
        eh = np.asarray(result.evals_hist)
        gh = np.asarray(result.gap_hist)
        shown = min(n, eh.shape[0])
        for i in range(shown):
            # iterations past the history capacity overwrite the last slot,
            # so when capped, the final row carries the LAST iteration
            label = (
                f"{i + 1}/{n}" if n <= eh.shape[0]
                else (f"{i + 1}/{n}" if i < shown - 1 else f"{n}/{n}")
            )
            tm.log(
                "  it {}: evals: {}  eigengap: {:1.3e}".format(
                    label, np.array2string(eh[i], precision=3), float(gh[i])
                )
            )
        if n > eh.shape[0]:
            tm.log(
                f"  (per-iteration history capped at {eh.shape[0]} rows; "
                f"iterations {shown}..{n - 1} not recorded)"
            )
    tm.log(
        "Iterations: {}  evals: {}  eigengap: {:1.3e}".format(
            n, np.asarray(result.evals), float(result.eigengap)
        )
    )


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


def pack_wire(packed: PackedProblem):
    """Host-side 32-byte/edge wire buffer for :func:`core.se3sync_wire`.

    Returns ``(wire (E, 8) f32, con (M, 12) f32)`` — the single-H2D /
    single-D2H fast path's exact transfer payloads (column layout documented
    on ``core.se3sync_wire``) — or ``None`` when the packed node indices
    overflow the 31-bit bit-packed field or the problem carries no
    quaternions (callers fall back to :func:`core.se3sync_fused`).
    """
    if not packed.has_quats:
        return None
    C, T = packed.num_cams, packed.num_times
    M = len(packed.marker_ids)
    mb = max((M - 1).bit_length(), 1)
    tb = max((T - 1).bit_length(), 1)
    cb = max((C - 1).bit_length(), 1)
    if cb + tb + mb > 31:
        return None
    E = packed.num_edges
    wire = np.empty((E, 8), np.float32)
    qi = np.clip(
        np.round(np.ascontiguousarray(packed.edata[:, :4]) * 32767.0),
        -32767, 32767,
    ).astype(np.int16)
    wire[:, 0:2] = qi.view(np.float32)
    wire[:, 2:7] = packed.edata[:, 4:9]
    iv = (
        (packed.eidx[:, 0].astype(np.int64) << (tb + mb))
        | (packed.eidx[:, 1].astype(np.int64) << mb)
        | packed.eidx[:, 2]
    ).astype(np.int32)
    wire[:, 7] = iv.view(np.float32)
    M_con = packed.R_con.shape[0]
    con = np.concatenate(
        [packed.R_con.reshape(M_con, 9), packed.t_con], axis=1
    ).astype(np.float32)
    return wire, con


# fall back to the 32-byte wire when log-quantizing the weights would cost
# more than this much relative error per weight (range > e^32.8 ~ 1.8e14)
_WIRE2_MAX_REL_STEP = 1e-3


def pack_wire_v2(packed: PackedProblem):
    """24-byte/edge wire for :func:`core.se3sync_wire2` (column layout
    documented there) — or ``None`` when the problem doesn't fit it
    (no quats / index overflow / non-positive or ultra-wide weights /
    non-finite translations); callers then fall back to :func:`pack_wire`.

    Returns ``(wire (E, 6) f32, con (M, 12) f32, scales (4,) f32)``.
    """
    if not packed.has_quats:
        return None
    C, T = packed.num_cams, packed.num_times
    M = len(packed.marker_ids)
    mb = max((M - 1).bit_length(), 1)
    tb = max((T - 1).bit_length(), 1)
    cb = max((C - 1).bit_length(), 1)
    if cb + tb + mb > 31:
        return None
    ed = packed.edata
    t = np.ascontiguousarray(ed[:, 4:7], np.float32)
    k = np.ascontiguousarray(ed[:, 7:9], np.float32)
    t_max = float(np.max(np.abs(t))) if t.size else 0.0
    if not np.isfinite(t_max):
        return None
    k_min = k.min(axis=0) if len(k) else np.ones(2, np.float32)
    k_max = k.max(axis=0) if len(k) else np.ones(2, np.float32)
    if not (np.all(k_min > 0.0) and np.all(np.isfinite(k_max))):
        return None
    # log step per column; the packer normalized each column to max = 1,
    # but tolerate unnormalized input (shift by log kmax, fold into c=0 case)
    with np.errstate(divide="ignore"):
        log_range = np.log(k_max / k_min)
    if np.any(log_range > 32766.0 * _WIRE2_MAX_REL_STEP):
        return None
    # decode is k = exp(-c*i), i.e. max-normalized weights; pack_problem's
    # f32 path guarantees kmax == 1 (weight-scale invariance), anything else
    # (hand-built PackedProblems) routes to the f32 wire
    if not np.allclose(k_max, 1.0, rtol=1e-6):
        return None
    E = packed.num_edges
    wire = np.empty((E, 6), np.float32)
    qi = np.clip(
        np.round(np.ascontiguousarray(ed[:, :4]) * 32767.0), -32767, 32767
    ).astype(np.int16)
    wire[:, 0:2] = qi.view(np.float32)
    t_scale = t_max / 32766.0 if t_max > 0 else 1.0
    ti = np.empty((E, 4), np.int16)
    ti[:, :3] = np.round(t * (1.0 / t_scale))
    ti[:, 3] = 0
    wire[:, 2:4] = ti.view(np.float32)
    c = log_range / 32766.0  # per-column log step (0 when constant)
    ki = np.zeros((E, 2), np.int16)
    if np.any(c > 0):
        lk = np.log(k, dtype=np.float32)  # one vectorized pass over (E, 2)
        for j in range(2):
            if c[j] > 0:
                ki[:, j] = np.clip(
                    np.round(lk[:, j] * (-1.0 / c[j])), 0, 32766
                )
    wire[:, 4] = ki.view(np.float32).ravel()
    iv = (
        (packed.eidx[:, 0].astype(np.int64) << (tb + mb))
        | (packed.eidx[:, 1].astype(np.int64) << mb)
        | packed.eidx[:, 2]
    ).astype(np.int32)
    wire[:, 5] = iv.view(np.float32)
    M_con = packed.R_con.shape[0]
    con = np.concatenate(
        [packed.R_con.reshape(M_con, 9), packed.t_con], axis=1
    ).astype(np.float32)
    scales = np.array([t_scale, c[0], c[1], 0.0], np.float32)
    return wire, con, scales


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
    if verbose:  # the node-count set over 2E keys is pure logging cost
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
    if _use_scale_path(packed.num_cams, packed.num_times, dtype):
        result = _so3_sync_large_from_packed(packed, dtype, maxiter, tm, verbose)
    else:
        arrs = _device_arrays(packed, dtype)
        with tm.phase("Optimizing") as ev:
            with jax.default_matmul_precision("highest"):
                KR = _core.fold_constraints(
                    arrs["R_e"], arrs["k_r"], arrs["marker_idx"], arrs["R_con"],
                    packed.root_idx,
                )
                result = _core.so3_sync(
                    KR, arrs["k_r"], arrs["cam_idx"], arrs["time_idx"],
                    C=packed.num_cams, T=packed.num_times,
                    maxiter=jnp.asarray(maxiter, jnp.int32),
                    cert_tol=1e-6 / packed.k_r_scale,
                )
            ev["sync"] = result
        if verbose:
            _log_sync_result(tm, result)

    r_cam = np.asarray(result.r_cam)
    r_time = np.asarray(result.r_time)
    out = {}
    for i, c in enumerate(packed.cam_ids):
        out[c] = r_cam[i]
    for j, t in enumerate(packed.time_ids):
        out[t + "_0"] = r_time[j]
    return out


def bipartite_so3sync(
    src_edges: dict,
    constraints: dict,
    noise_model: Callable,
    edge_filter: Callable,
    maxiter: int,
    dtype=np.float32,
    verbose: bool = True,
) -> dict:
    """SO(3) sync on the FULL bipartite connection Laplacian — the
    reference's small-graph variant (vican/bipgo.py:18-142), faithfully.

    This entry point intentionally preserves that variant's own conventions,
    which differ from :func:`large_bipartite_so3sync` (the live VICAN
    algorithm): constraint folding ``R_e @ R_m @ R_0^T`` (bipgo.py:45, vs
    the live ``R_e @ R_m^T @ R_0``), a (3n, 3n) Laplacian over cameras AND
    time nodes with no power-graph elimination, one ``U S U^T`` dual update
    for every node, exactly ``maxiter`` iterations, and *untransposed*
    output blocks keyed by camera id and ``"<t>_0"``.  Nodes are ordered
    lexicographically by their ``'c<id>'``/``'t<id>'`` names like the
    reference, so the output gauge matches it too.  O((3(C+T))^3) per
    iteration — use the live algorithm for anything beyond small graphs.
    """
    import jax
    import jax.numpy as jnp

    dtype = _solver_dtype(dtype)
    tm = PhaseTimer(verbose=verbose)
    if verbose:
        tm.log(
            "Received graph with {} nodes {} edges".format(
                len({n for e in src_edges for n in e}), len(src_edges)
            )
        )
    with tm.phase("Applying constraints"):
        packed = pack_problem(
            src_edges, constraints, noise_model, lambda e: 1.0, edge_filter,
            dtype=dtype,
        )
    C, T = packed.num_cams, packed.num_times
    n = C + T
    if verbose:
        tm.log("New SO(3) graph contains {} nodes {} edges".format(n, packed.num_edges))

    # Reference node order = np.unique over 'c<cam>'/'t<time>' names
    # (bipgo.py:54-55).  packed.cam_ids/time_ids are already sorted and every
    # 'c*' name sorts before every 't*' name, so that order is exactly
    # [cameras..., times...] — no remapping needed.
    i_idx = np.asarray(packed.cam_idx, np.int32)
    j_idx = C + np.asarray(packed.time_idx, np.int32)

    arrs = _device_arrays(packed, dtype)
    with tm.phase("Optimizing (full bipartite Laplacian)"):
        with jax.default_matmul_precision("highest"):
            KR = _core.fold_constraints_small(
                arrs["R_e"], arrs["k_r"], arrs["marker_idx"], arrs["R_con"],
                packed.root_idx,
            )
            r, evals, eigengap = _core.so3_sync_small(
                KR, arrs["k_r"], jnp.asarray(i_idx), jnp.asarray(j_idx),
                n=n, maxiter=jnp.asarray(maxiter, jnp.int32),
            )
        r = np.asarray(r)
    if verbose:
        tm.log(
            "Eigenvalues: {}  eigengap: {:1.3e}".format(np.asarray(evals), float(eigengap))
        )

    out = {}
    for ci, c in enumerate(packed.cam_ids):
        out[c] = r[ci]
    for ti, t in enumerate(packed.time_ids):
        out[t + "_0"] = r[C + ti]
    return out


def _block_budget_bytes() -> int:
    """Memory budget for the dense (C, 3, T, 3) block tensor.

    Past this the dict API transparently reroutes to the chunked large-graph
    path (solver/scale.py) — the reference handles any size via scipy sparse
    (bipgo.py:353-490), so the public API must too.  Overridable via
    ``VICAN_TPU_BLOCK_BUDGET_BYTES`` (read per call so tests can steer it).
    """
    return int(os.environ.get("VICAN_TPU_BLOCK_BUDGET_BYTES", 2 << 30))


def _use_scale_path(C: int, T: int, dtype) -> bool:
    """Route to the chunked/CheFSI path on memory OR eigensolver-size grounds.

    Memory: the dense block tensor past ``_block_budget_bytes``.  Size: the
    dense path's per-iteration ``eigh`` is O((3C)^3) — measured 0.28 s at
    3C = 3000 and 1.6 s at 3C = 6000 on a v5e, while warm CheFSI stays in
    tens of milliseconds — so camera counts past ``VICAN_TPU_SCALE_MIN_CAMS``
    (default 1024) also reroute.
    """
    block_bytes = C * T * 9 * np.dtype(dtype).itemsize
    min_cams = int(os.environ.get("VICAN_TPU_SCALE_MIN_CAMS", 1024))
    return block_bytes > _block_budget_bytes() or C > min_cams


def _so3_sync_large_from_packed(
    packed: PackedProblem, dtype, maxiter, tm, verbose, mesh=None
):
    """Rotation stage of the large-graph route: fold on host, chunk, solve.

    Folding runs on the host: the (E,3,3) matmuls are trivial next to
    shipping E folded blocks over the host link twice (fold on device would
    round-trip KR back for the chunk sort).  Returns a
    :class:`~vican_tpu.solver.core.SyncResult`.
    """
    import jax
    import jax.numpy as jnp

    from .solver import scale as _scale

    C, T = packed.num_cams, packed.num_times
    # ~8 chunks by default: the (3C, 3C) power-graph accumulator is re-read/
    # written once per chunk, so few large chunks amortize its HBM traffic
    # (dominant at C ~ 10k where the accumulator is gigabytes)
    chunk_t = int(os.environ.get("VICAN_TPU_SCALE_CHUNK_T", 0)) or min(
        T, max(64, -(-T // 8))
    )
    # The dominant filter matvecs are governed by filter_dtype (bf16 by
    # default, with a full-precision polish); the remaining f32 contractions
    # are bandwidth-bound, so full f32 precision costs nothing extra.
    precision = os.environ.get("VICAN_TPU_SCALE_PRECISION", "highest")
    cert_tol = 1e-6 / packed.k_r_scale

    with tm.phase("Folding constraints (host, chunked)"):
        R0 = packed.R_con[packed.root_idx]
        Rm = packed.R_con[packed.marker_idx]
        R_fold = np.matmul(packed.R_e, np.matmul(Rm.transpose(0, 2, 1), R0))
        if np.dtype(dtype) == np.float32 and packed.has_quats:
            # compact wire: int16 quats, 8 bytes/edge over the host link
            # instead of 36 (matches core.se3sync_wire's transfer budget).
            # Gated on has_quats like the fused route: when the packer's
            # orthonormality gate failed, the raw matrices must be folded
            # as-is (reference behavior), not quat-projected.
            chunked = _scale.sort_edges_by_time_wire(
                R_fold, packed.k_r.astype(dtype),
                packed.cam_idx, packed.time_idx, T, chunk_t,
            )
        else:
            KR = packed.k_r[:, None, None] * R_fold
            chunked = _scale.sort_edges_by_time(
                KR.astype(dtype), packed.k_r.astype(dtype),
                packed.cam_idx, packed.time_idx, T, chunk_t,
            )
    block_bytes = C * T * 9 * np.dtype(dtype).itemsize
    reason = (
        "block-tensor budget exceeded"
        if block_bytes > _block_budget_bytes()
        else "camera count past the dense-eigh threshold"
    )
    tm.log(
        "Large-graph path: {} chunks of {} timesteps ({})".format(
            chunked[0].shape[0], chunk_t, reason
        )
    )

    with tm.phase("Optimizing (chunked power graph)") as ev:
        with jax.default_matmul_precision("highest"):
            if mesh is not None:
                result = _scale.so3_sync_large_sharded(
                    *chunked, C=C, T=T, chunk_t=chunk_t, maxiter=maxiter,
                    mesh=mesh, cert_tol=cert_tol, precision=precision,
                )
            else:
                result = _scale.so3_sync_large(
                    *[jnp.asarray(x) for x in chunked], C=C, T=T,
                    chunk_t=chunk_t, maxiter=jnp.asarray(maxiter, jnp.int32),
                    cert_tol=cert_tol, precision=precision,
                )
        ev["sync"] = result
    if verbose:
        _log_sync_result(tm, result)
    return result


def _se3sync_scale_path(
    packed: PackedProblem, dtype, maxiter, lsqr_solver, tm, verbose,
    mesh=None, requested=None,
) -> dict:
    """The 10k-camera route: chunked power graph + matrix-free translations.

    Same algorithm and output contract as the dense path; the (C,3,T,3)
    block tensor is replaced by a stream of (3C, 3Tc) chunk matmuls
    (:func:`vican_tpu.solver.scale.so3_sync_large`), optionally sharded over
    a device mesh (SURVEY.md §5 sequence parallelism).  ``requested`` is the
    caller's original dtype: an f64 request on an f32 device gets the same
    host-f64 translation fallback (or explicit downgrade warning) as the
    dense route.
    """
    import jax
    import jax.numpy as jnp

    from .solver.host_fallback import (
        MAX_HOST_EDGES, host_f64_enabled, solve_translations_host,
    )

    C, T = packed.num_cams, packed.num_times
    result = _so3_sync_large_from_packed(packed, dtype, maxiter, tm, verbose, mesh)

    if requested is not None and np.dtype(requested) == np.float64 and dtype != np.float64:
        if host_f64_enabled(packed.num_edges):
            if packed.num_edges > MAX_HOST_EDGES:
                tm.log(
                    f"Honoring float64: host translation solve over "
                    f"{packed.num_edges} edges (iterative; set "
                    "VICAN_TPU_MAX_HOST_EDGES to cap and accept device f32)"
                )
            with tm.phase("Solving translations (host float64)"):
                t_est, res = solve_translations_host(
                    packed, np.asarray(result.r_cam), np.asarray(result.r_time),
                    lsqr_solver,
                )
            res = float(res)
            if res > 1e-3:
                warnings.warn(f"translation solve residual {res:.3e} (poorly converged)")
            out = _scale_path_out(packed, result, t_est, C)
            tm.log("Done!")
            return out
        warnings.warn(
            f"float64 requested but VICAN_TPU_MAX_HOST_EDGES caps the host-f64 "
            f"translation solve below this problem's {packed.num_edges} edges: "
            "the whole solve proceeds in device float32"
        )

    with tm.phase("Solving translations (matrix-free)"):
        t_e = jnp.asarray(packed.t_e, dtype)
        k_t = jnp.asarray(packed.k_t, dtype)
        cam_idx = jnp.asarray(packed.cam_idx)
        time_idx = jnp.asarray(packed.time_idx)
        with jax.default_matmul_precision("highest"):
            t_tilde = _core.translation_rhs(
                result.r_cam.astype(dtype), result.r_time.astype(dtype),
                t_e, k_t, cam_idx, time_idx,
                jnp.asarray(packed.marker_idx), jnp.asarray(packed.R_con, dtype),
                jnp.asarray(packed.t_con, dtype), packed.root_idx,
            )
            if lsqr_solver == "conjugate_gradient":
                t_est, res = _core.solve_translations_cg(
                    t_tilde, k_t, cam_idx, time_idx, C=C, T=T
                )
            else:  # "direct" (validated by the caller)
                t_est, res = _core.solve_translations_lsqr(
                    t_tilde, k_t, cam_idx, time_idx, C=C, T=T
                )
        t_est = np.asarray(t_est)

    res = float(res)
    if res > 1e-3:
        warnings.warn(f"translation solve residual {res:.3e} (poorly converged)")
    out = _scale_path_out(packed, result, t_est, C)
    tm.log("Done!")
    return out


def _scale_path_out(packed, result, t_est, C):
    r_cam = np.asarray(result.r_cam)
    r_time = np.asarray(result.r_time)
    out = {}
    for i, c in enumerate(packed.cam_ids):
        out[c] = SE3(R=r_cam[i], t=t_est[i])
    for j, t in enumerate(packed.time_ids):
        out[t + "_0"] = SE3(R=r_time[j], t=t_est[C + j])
    return out


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
    mesh=None,
) -> dict:
    """SE(3) synchronization in large bipartite graphs with node constraints.

    Rotation stage via the power-graph primal-dual sync; translations from a
    weighted incidence least-squares system solved matrix-free on device
    (``lsqr_solver``: ``"conjugate_gradient"`` for CG on the normal equations,
    ``"direct"`` for LSQR — both iterative, mirroring bipgo.py:476-480).
    Returns ``{node: SE3}`` world-frame poses for cameras and ``"<t>_0"``
    object nodes.

    Problems whose dense (C,3,T,3) block tensor exceeds the memory budget
    (``VICAN_TPU_BLOCK_BUDGET_BYTES``, default 2 GiB) are transparently
    routed to the chunked large-graph solver — the dict API handles any size,
    like the reference's scipy-sparse formulation (bipgo.py:353-490).
    ``mesh``: optional ``jax.sharding.Mesh``; the large-graph chunk stream is
    sharded over its first axis.
    """
    import jax
    import jax.numpy as jnp

    if lsqr_solver not in ("conjugate_gradient", "direct"):
        raise ValueError(
            f"unknown lsqr_solver: {lsqr_solver!r}; "
            "expected 'conjugate_gradient' or 'direct'"
        )
    requested = np.dtype(dtype)
    dtype = _solver_dtype(dtype)
    tm = PhaseTimer(verbose=verbose)
    if verbose:  # the node-count set over 2E keys is pure logging cost
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

    C, T = packed.num_cams, packed.num_times
    if _use_scale_path(C, T, dtype):
        return _se3sync_scale_path(
            packed, dtype, maxiter, lsqr_solver, tm, verbose, mesh=mesh,
            requested=requested,
        )

    # The fused CG path ships packed.edata/eidx directly; the other branches
    # use per-field device arrays.
    arrs = None
    if not (lsqr_solver == "conjugate_gradient" and packed.has_quats):
        arrs = _device_arrays(packed, dtype)

    # Reference-grade f64: when the caller asked for float64 but the device
    # computes f32 (TPU), the translation stage runs on the host in f64 —
    # extreme noise-model weight ranges (area**6 spans ~1e-6..1, main.ipynb
    # cell 3) are unresolvable in f32 normal equations.  Rotations stay on
    # device (f32 with HIGHEST matmuls matches f64 — tests/test_solver.py).
    # The host solvers are iterative (O(E) memory), so the f64 request is
    # honored at any size unless capped via VICAN_TPU_MAX_HOST_EDGES.
    from .solver.host_fallback import (
        MAX_HOST_EDGES, host_f64_enabled, solve_translations_host,
    )

    host_f64_translations = (
        requested == np.float64
        and dtype != np.float64
        and host_f64_enabled(packed.num_edges)
    )
    if host_f64_translations and packed.num_edges > MAX_HOST_EDGES:
        tm.log(
            f"Honoring float64: host translation solve over "
            f"{packed.num_edges} edges (iterative; set "
            "VICAN_TPU_MAX_HOST_EDGES to cap and accept device f32)"
        )
    if (
        requested == np.float64
        and dtype != np.float64
        and not host_f64_translations
    ):
        warnings.warn(
            f"float64 requested but VICAN_TPU_MAX_HOST_EDGES caps the host-f64 "
            f"translation solve below this problem's {packed.num_edges} edges: "
            "the whole solve proceeds in device float32",
            stacklevel=2,
        )

    if host_f64_translations:
        if arrs is None:
            arrs = _device_arrays(packed, dtype)
        with tm.phase("Optimizing (device) + solving (host f64)") as ev:
            with jax.default_matmul_precision("highest"):
                KR = _core.fold_constraints(
                    arrs["R_e"], arrs["k_r"], arrs["marker_idx"], arrs["R_con"],
                    packed.root_idx,
                )
                result = _core.so3_sync(
                    KR, arrs["k_r"], arrs["cam_idx"], arrs["time_idx"],
                    C=C, T=T, maxiter=jnp.asarray(maxiter, jnp.int32),
                    cert_tol=1e-6 / packed.k_r_scale,
                )
            r_cam = np.asarray(result.r_cam)
            r_time = np.asarray(result.r_time)
            t_est, res = solve_translations_host(packed, r_cam, r_time, lsqr_solver)
            ev["sync"] = result
        if verbose:
            _log_sync_result(tm, result)
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
            out_packed = None
            if lsqr_solver == "conjugate_gradient" and packed.has_quats:
                # Fastest path: poses + CG residual come back in ONE D2H
                # fetch; the per-edge problem goes up in ONE H2D transfer
                # when the node indices fit a 31-bit field (bitcast into the
                # f32 buffer), else two.
                kw = dict(
                    root_idx=packed.root_idx, C=C, T=T,
                    maxiter=jnp.asarray(maxiter, jnp.int32),
                    cert_tol=1e-6 / packed.k_r_scale,
                )
                # wire v2 (24 B/edge) by default; VICAN_TPU_WIRE=v1 pins the
                # f32 wire (A/B + belt-and-braces escape hatch), =fused
                # disables the wire entirely
                wire_mode = os.environ.get("VICAN_TPU_WIRE", "v2")
                wire2 = (
                    pack_wire_v2(packed)
                    if wire_mode == "v2" and np.dtype(dtype) == np.float32
                    else None
                )
                wire_con = (
                    pack_wire(packed)
                    if wire2 is None and wire_mode != "fused"
                    and np.dtype(dtype) == np.float32
                    else None
                )
                if wire2 is not None:
                    result, fused_out = _core.se3sync_wire2(
                        jnp.asarray(wire2[0]), jnp.asarray(wire2[1]),
                        jnp.asarray(wire2[2]), **kw
                    )
                elif wire_con is not None:
                    result, fused_out = _core.se3sync_wire(
                        jnp.asarray(wire_con[0]), jnp.asarray(wire_con[1]), **kw
                    )
                else:
                    result, fused_out = _core.se3sync_fused(
                        jnp.asarray(packed.edata, dtype), jnp.asarray(packed.eidx),
                        jnp.asarray(packed.R_con, dtype),
                        jnp.asarray(packed.t_con, dtype), **kw
                    )
                out_packed = np.asarray(fused_out)
                res = out_packed[C + T, 0]
            elif lsqr_solver == "conjugate_gradient":
                result, poses44, res = _core.se3sync_full(
                    arrs["R_e"], arrs["t_e"], arrs["k_r"], arrs["k_t"],
                    arrs["cam_idx"], arrs["time_idx"], arrs["marker_idx"],
                    arrs["R_con"], arrs["t_con"],
                    root_idx=packed.root_idx, C=C, T=T,
                    maxiter=jnp.asarray(maxiter, jnp.int32),
                    cert_tol=1e-6 / packed.k_r_scale,
                )
            elif lsqr_solver == "direct":
                KR = _core.fold_constraints(
                    arrs["R_e"], arrs["k_r"], arrs["marker_idx"], arrs["R_con"],
                    packed.root_idx,
                )
                result = _core.so3_sync(
                    KR, arrs["k_r"], arrs["cam_idx"], arrs["time_idx"],
                    C=C, T=T, maxiter=jnp.asarray(maxiter, jnp.int32),
                    cert_tol=1e-6 / packed.k_r_scale,
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
        # when out_packed was fetched above, the np.asarray D2H already
        # synchronized the whole fused program — a block here would only
        # add another ~25 ms axon RPC (see utils/timing._block)
        if out_packed is None:
            ev["sync"] = (result, poses44 if poses44 is not None else t_est)
    if verbose:
        _log_sync_result(tm, result)
    res = float(res)
    if res > 1e-3:
        warnings.warn(f"translation solve residual {res:.3e} (poorly converged)")

    out = {}
    if out_packed is not None:
        # rebuild (N, 4, 4) poses from the packed [R|t] rows on host (cheap)
        # and hand out zero-copy SE3 views (keeps the solver dtype; a float32
        # cast through the pose= ctor would cap rotation accuracy at ~0.02
        # deg via arccos cancellation).
        N = C + T
        p12 = out_packed[:N]
        poses = np.zeros((N, 4, 4), p12.dtype)
        poses[:, :3, :3] = p12[:, :9].reshape(N, 3, 3)
        poses[:, :3, 3] = p12[:, 9:]
        poses[:, 3, 3] = 1.0
        from_pose = SE3._from_pose_view
        for i, c in enumerate(packed.cam_ids):
            out[c] = from_pose(poses[i])
        for j, t in enumerate(packed.time_ids):
            out[t + "_0"] = from_pose(poses[C + j])
    elif poses44 is not None:
        poses44 = np.asarray(poses44)
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

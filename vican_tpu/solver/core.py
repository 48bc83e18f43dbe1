"""Device solver core: primal-dual bipartite SE(3) synchronization on TPU.

TPU-first redesign of the reference pipeline (vican/bipgo.py:145-490):

- Constraint folding (bipgo.py:203-223) -> one batched einsum; the per-(c,t)
  aggregation the reference does with a Python dict loop happens implicitly in
  the scatter-add that builds the block tensor ``B`` (duplicate (c,t) indices
  accumulate).
- The power graph ``R~ = R_ct . Lambda_T . R_ct^T`` (bipgo.py:273,334) is
  built as a single dense (3C, 3T)x(3T, 3C) matmul on the MXU from ``B``.
  C (number of cameras) is small — hundreds — so the 3Cx3C result is tiny;
  this replaces SciPy CSR products.  The time-dual input ``R_ct^T r``
  (bipgo.py:318) is likewise one einsum over ``B`` — profiling showed TPU
  scatter/segment-sum at ~37 ms for (1e5,3,3) blocks vs 0.2 ms for the
  equivalent contraction, so the only scatter left is the one-time build of B.
- The bottom-5 eigenpairs (ARPACK shift-invert ``eigs(k=5, sigma=-1e-6)``,
  bipgo.py:288) become a dense ``jnp.linalg.eigh`` of the (normalized) 3Cx3C
  Laplacian; we select the 5 eigenvalues closest to -1e-6 to mirror ARPACK's
  shift-invert ordering exactly.
- Per-block SVD loops for primal rounding and dual updates (bipgo.py:295-332)
  -> ``vmap``-batched 3x3 SVDs.
- The primal-dual loop with the optimality-certificate early exit
  (bipgo.py:282-284) -> ``lax.while_loop``.
- Translation least squares (bipgo.py:434-481): the incidence system is never
  materialized; CG runs on the normal-equation matvec built from two
  scatter-adds, and the "direct" path is a jitted LSQR on the same operators
  (SciPy's ``lsqr`` is itself iterative).
- :func:`se3sync_full` fuses fold -> sync -> rhs -> CG into ONE jitted
  program: a single dispatch, no intermediate host syncs, full XLA fusion
  across stages.

Everything in this module is pure jnp on static shapes: jit/vmap/GSPMD
compatible.  The host boundary (string parsing, user callables) lives in
:mod:`vican_tpu.solver.packing`.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.lie import quat_to_mat, svd3_so3, project_so3

# TPU matmuls default to bf16-accumulation passes (~2.6e-3 relative error);
# the solver's graph products and eigensolve need true f32 throughout.
HIGHEST = lax.Precision.HIGHEST

__all__ = [
    "fold_constraints",
    "fold_constraints_small",
    "so3_sync",
    "so3_sync_small",
    "se3sync_full",
    "se3sync_fused",
    "se3sync_wire",
    "translation_rhs",
    "solve_translations_cg",
    "solve_translations_lsqr",
    "SyncResult",
]


# Capacity of the per-iteration diagnostic histories (the reference runs
# maxiter=4; iterations past the cap keep overwriting the last slot).
HIST_CAP = 32


class SyncResult(NamedTuple):
    """Output of :func:`so3_sync` (all world-frame, like bipgo.py:343-350)."""

    r_cam: jnp.ndarray  # (C, 3, 3) world-frame camera rotations
    r_time: jnp.ndarray  # (T, 3, 3) world-frame object rotations per timestep
    evals: jnp.ndarray  # (5,) final eigenvalues nearest -1e-6 (diagnostics)
    eigengap: jnp.ndarray  # |evals[3]/evals[2]| of the final iteration
    num_iters: jnp.ndarray  # iterations actually executed
    # Per-iteration histories (reference bipgo.py:336-340 prints eigenvalues
    # + eigengap in the tqdm postfix every primal-dual iteration); rows past
    # num_iters are zero.  None on entry points that predate the histories.
    evals_hist: jnp.ndarray | None = None  # (HIST_CAP, 5)
    gap_hist: jnp.ndarray | None = None  # (HIST_CAP,)


def fold_constraints(R_e, k_r, marker_idx, R_con, root_idx):
    """Per-edge constraint folding (bipgo.py:209-213).

    ``kr_c0 = k_r * R_edge @ R_m^T @ R_0`` — the (c,t) aggregation the
    reference performs in its dict loop (bipgo.py:215-221) happens later in
    the scatter-add building the block tensor.  ``R_e`` may arrive as (E, 4)
    quaternions (compact transfer — the host link is bandwidth-bound).
    """
    if R_e.ndim == 2:
        R_e = quat_to_mat(R_e)
    R0 = R_con[root_idx]
    Rm = R_con[marker_idx]  # (E,3,3)
    return k_r[:, None, None] * jnp.einsum(
        "eij,ekj,kl->eil", R_e, Rm, R0, precision=HIGHEST
    )


def fold_constraints_small(R_e, k_r, marker_idx, R_con, root_idx):
    """Folding of the reference's SMALL-graph variant (bipgo.py:45):
    ``kr = k_r * R_edge @ R_m @ R_0^T`` — note the conjugation differs from
    the live algorithm's ``R_edge @ R_m^T @ R_0`` (:func:`fold_constraints`).
    """
    if R_e.ndim == 2:
        R_e = quat_to_mat(R_e)
    R0 = R_con[root_idx]
    Rm = R_con[marker_idx]
    return k_r[:, None, None] * jnp.einsum(
        "eij,ejk,lk->eil", R_e, Rm, R0, precision=HIGHEST
    )


@partial(jax.jit, static_argnames=("n",))
def so3_sync_small(KR, k_r, i_idx, j_idx, *, n: int, maxiter):
    """Faithful device port of the reference's small-graph
    ``bipartite_so3sync`` (vican/bipgo.py:18-142) — distinct from the live
    power-graph algorithm in four ways it preserves exactly:

    - the full symmetric (3n, 3n) connection Laplacian over cameras AND
      time nodes (no power-graph elimination; ``n = C + T``),
    - a single dual update for ALL nodes from SVDs of ``(R_pairwise r)``
      blocks (``Lambda = U S U^T``, bipgo.py:119-133; no inverse time dual),
    - the primal refresh ``r = U V^T`` WITHOUT a determinant fix
      (bipgo.py:127),
    - exactly ``maxiter`` iterations, no certificate early-exit, and
      UNtransposed output blocks (bipgo.py:101,139-141).

    ``i_idx``/``j_idx``: per-edge global node indices (camera/time) in the
    caller's node order — the reference orders nodes lexicographically by
    their ``'c<id>'``/``'t<id>'`` names, and the gauge anchors to node 0
    (bipgo.py:113), so the order is part of the contract.
    Returns ``(r (n, 3, 3), evals (5,), eigengap)``.
    """
    dtype = KR.dtype
    N = 3 * n
    a3 = jnp.arange(3, dtype=jnp.int32)
    rows = 3 * i_idx[:, None, None] + a3[None, :, None]
    cols = 3 * j_idx[:, None, None] + a3[None, None, :]
    # duplicate (c, t) edges accumulate — the reference's dict aggregation
    B = jnp.zeros((N, N), dtype).at[rows, cols].add(KR)
    B = B + B.T  # mirrored lower blocks (i/j index disjoint node sets)

    deg = jnp.zeros((n,), dtype).at[i_idx].add(k_r).at[j_idx].add(k_r)
    eye3 = jnp.eye(3, dtype=dtype)
    lbd0 = deg[:, None, None] * eye3

    def body(_, state):
        lbd, _, _, _ = state
        L = _add_block_diag(-B, lbd)
        L = 0.5 * (L + L.T)
        evals5, V5 = _bottom5_like_arpack(L)
        eigengap = jnp.abs(evals5[3] / evals5[2])

        V3 = V5[:, :3]
        r = jnp.matmul(V3, jnp.linalg.inv(V3[:3, :3]), precision=HIGHEST)
        r_blocks = project_so3(r.reshape(n, 3, 3))

        Z = jnp.matmul(B, r_blocks.reshape(N, 3), precision=HIGHEST).reshape(n, 3, 3)
        _, u, s, vt = svd3_so3(Z)
        r_out = jnp.matmul(u, vt, precision=HIGHEST)  # no det fix (bipgo.py:127)
        lbd_new = jnp.einsum("nab,nb,ndb->nad", u, s, u, precision=HIGHEST)
        return (lbd_new, r_out, evals5, eigengap)

    init = (
        lbd0,
        jnp.broadcast_to(eye3, (n, 3, 3)),
        jnp.zeros((5,), dtype),
        jnp.asarray(0.0, dtype),
    )
    _, r_out, evals5, eigengap = lax.fori_loop(0, maxiter, body, init)
    return r_out, evals5, eigengap


def _power_graph(B3, lbd_t):
    """Dense power graph ``R~`` from the block tensor.

    ``B3``: (C, 3, T, 3) with ``B3[i, :, t, :] = M_{it}``;
    ``lbd_t``: (T, 3, 3) block-diagonal time dual.
    Returns (3C, 3C).  The contraction is one MXU matmul:
    ``R~[i a, j c] = sum_{t b d} M_it[a,b] lbd_t[b,d] M_jt[c,d]``
    (bipgo.py:273,334 — without materializing any 3Tx3T matrix).
    """
    C = B3.shape[0]
    Y = jnp.einsum("iatb,tbd->iatd", B3, lbd_t, precision=HIGHEST)
    R = jnp.einsum("iatd,jctd->iajc", Y, B3, precision=HIGHEST)
    return R.reshape(3 * C, 3 * C)


def _add_block_diag(dense, blocks):
    """Add (C,3,3) blocks onto the 3x3 diagonal blocks of a (3C,3C) matrix."""
    C = blocks.shape[0]
    L = dense.reshape(C, 3, C, 3)
    idx = jnp.arange(C)
    L = L.at[idx, :, idx, :].add(blocks)
    return L.reshape(3 * C, 3 * C)


def _bottom5_like_arpack(L):
    """Eigen-pairs nearest sigma = -1e-6, mimicking shift-invert ARPACK.

    The reference calls ``scipy.sparse.linalg.eigs(L, k=5, sigma=-1e-6)``
    (bipgo.py:288), which returns the 5 eigenvalues closest to sigma in
    increasing ``|lambda - sigma|`` order.  We take the full symmetric
    eigendecomposition (3C is small) and re-order.  The Laplacian is
    normalized by its largest diagonal entry before ``eigh`` for f32 accuracy
    (eigenvectors unchanged; eigenvalues rescaled back).
    """
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(L))), 1e-30)
    evals, evecs = jnp.linalg.eigh(L / scale)
    evals = evals * scale
    order = jnp.argsort(jnp.abs(evals + 1e-6))
    sel = order[:5]
    return evals[sel], evecs[:, sel]


@partial(jax.jit, static_argnames=("C", "T"))
def so3_sync(KR, k_r, cam_idx, time_idx, *, C: int, T: int, maxiter, cert_tol=1e-6) -> SyncResult:
    """Primal-dual SO(3) synchronization over the camera power graph.

    Faithful to ``large_bipartite_so3sync`` (bipgo.py:145-350): same
    initialization (degree duals), same update order (primal rounding ->
    camera dual via SVD of ``R~ r`` -> time dual via SVD of ``R_ct^T r`` ->
    power-graph refresh), same certificate (max |eval| <= cert_tol checked at
    the top of each iteration, bipgo.py:283-284).

    Parameters
    ----------
    KR : (E, 3, 3) folded edge blocks from :func:`fold_constraints`.
    k_r : (E,) edge weights.
    cam_idx, time_idx : (E,) int32 node indices per edge.
    maxiter : int scalar (may be traced).
    """
    dtype = KR.dtype

    # Degrees (bipgo.py:271-276).  Time degrees feed Lambda_T^0 = deg_t^-1 I;
    # the camera power-graph degree reduces analytically to the camera degree.
    deg_t = jnp.zeros((T,), dtype).at[time_idx].add(k_r)
    deg_c = jnp.zeros((C,), dtype).at[cam_idx].add(k_r)

    # Loop-invariant block tensor B3[i,:,t,:] = sum of folded blocks for
    # (camera i, time t) — the scatter-add IS the reference's aggregation.
    B3 = jnp.zeros((C, 3, T, 3), dtype=dtype).at[cam_idx, :, time_idx, :].add(KR)

    eye3 = jnp.eye(3, dtype=dtype)
    lbd_t0 = eye3 / jnp.maximum(deg_t, 1e-30)[:, None, None]
    lbd_c0 = deg_c[:, None, None] * eye3

    def cond(state):
        it, max_eval, *_ = state
        return (it < maxiter) & (max_eval > cert_tol)

    def body(state):
        it, _, lbd_c, lbd_t, _, _, _, _, ev_hist, gap_hist = state

        # Laplacian of the current power graph (bipgo.py:285-286 /
        # refresh at :334 folded into the loop top).
        pwr = _power_graph(B3, lbd_t)
        L = _add_block_diag(-pwr, lbd_c)
        L = 0.5 * (L + L.T)

        evals5, V5 = _bottom5_like_arpack(L)
        eigengap = jnp.abs(evals5[3] / evals5[2])
        max_eval = jnp.max(jnp.abs(evals5))

        # Primal rounding (bipgo.py:295-297): anchor gauge to block 0, then
        # project every 3x3 block onto SO(3).
        V3 = V5[:, :3]
        r = jnp.matmul(V3, jnp.linalg.inv(V3[:3, :3]), precision=HIGHEST)
        r_blocks = project_so3(r.reshape(C, 3, 3))

        # Camera dual update (bipgo.py:300-315): SVD of (R~ r) blocks.
        rtr = jnp.matmul(pwr, r_blocks.reshape(3 * C, 3), precision=HIGHEST).reshape(C, 3, 3)
        r_c, u, s, _ = svd3_so3(rtr)
        lbd_c_new = jnp.einsum("cab,cb,cdb->cad", u, s, u, precision=HIGHEST)

        # Time dual update (bipgo.py:317-332): SVD of (R_ct^T r) blocks.
        # One contraction over B3 — r_t[t] = sum_i M_it^T r_c[i].
        rt_raw = jnp.einsum("iatb,iac->tbc", B3, r_c, precision=HIGHEST)
        r_t, ut, st, _ = svd3_so3(rt_raw)
        # pseudo-inverse guard: a (near-)rank-deficient time block would put
        # ~1e30 into Lambda_T and blow up the next power graph; zeroing the
        # tiny directions is the stable generalization of bipgo.py:329.
        st_inv = jnp.where(st > 1e-9 * st[..., :1], 1.0 / jnp.maximum(st, 1e-30), 0.0)
        lbd_t_new = jnp.einsum("tab,tb,tdb->tad", ut, st_inv, ut, precision=HIGHEST)

        slot = jnp.minimum(it, HIST_CAP - 1)
        ev_hist_new = ev_hist.at[slot].set(evals5)
        gap_hist_new = gap_hist.at[slot].set(eigengap)
        return (
            it + 1, max_eval, lbd_c_new, lbd_t_new, r_c, r_t, evals5, eigengap,
            ev_hist_new, gap_hist_new,
        )

    init = (
        jnp.zeros((), jnp.int32),
        jnp.asarray(1.0, dtype),
        lbd_c0,
        lbd_t0,
        jnp.broadcast_to(eye3, (C, 3, 3)),
        jnp.broadcast_to(eye3, (T, 3, 3)),
        jnp.zeros((5,), dtype),
        jnp.asarray(0.0, dtype),
        jnp.zeros((HIST_CAP, 5), dtype),
        jnp.zeros((HIST_CAP,), dtype),
    )
    out = lax.while_loop(cond, body, init)
    it, _, _, _, r_c, r_t, evals5, eigengap, ev_hist, gap_hist = out

    # World-frame output = transposed blocks (bipgo.py:343-350).
    return SyncResult(
        r_cam=jnp.swapaxes(r_c, -1, -2),
        r_time=jnp.swapaxes(r_t, -1, -2),
        evals=evals5,
        eigengap=eigengap,
        num_iters=it,
        evals_hist=ev_hist,
        gap_hist=gap_hist,
    )


# ---------------------------------------------------------------------------
# Translation stage (bipgo.py:420-481)
# ---------------------------------------------------------------------------


def translation_rhs(
    r_cam, r_time, t_e, k_t, cam_idx, time_idx, marker_idx, R_con, t_con, root_idx
):
    """Per-edge translation measurements ``t~`` (bipgo.py:449-455).

    ``t~_e = k_t (R^w_c t_e + R^w_t R_0^T R_m t_{m->0})`` with
    ``t_{m->0} = -R_m^T (t_m - t_0)`` from the constraint poses.
    """
    R0 = R_con[root_idx]
    t0 = t_con[root_idx]
    Rm = R_con[marker_idx]  # (E,3,3)
    tm = t_con[marker_idx]  # (E,3)
    r0m = jnp.einsum("ji,ejk->eik", R0, Rm, precision=HIGHEST)  # R_0^T R_m
    tm0 = jnp.einsum("eji,ej->ei", Rm, t0 - tm, precision=HIGHEST)
    term_c = jnp.einsum("eij,ej->ei", r_cam[cam_idx], t_e, precision=HIGHEST)
    term_t = jnp.einsum("eij,ejk,ek->ei", r_time[time_idx], r0m, tm0, precision=HIGHEST)
    return k_t[:, None] * (term_c + term_t)


def _normal_matvec(x, k_t2, cam_idx, time_idx, C, T):
    """Matvec of ``A^T A`` for the stacked incidence system (bipgo.py:457-469).

    ``A`` has one 3-row block per edge: ``-k_t I`` at the camera node and
    ``+k_t I`` at the time node; nodes are ordered cameras then times.
    """
    xc, xt = x[:C], x[C:]
    z = k_t2[:, None] * (xt[time_idx] - xc[cam_idx])
    out_c = -jnp.zeros((C, 3), x.dtype).at[cam_idx].add(z)
    out_t = jnp.zeros((T, 3), x.dtype).at[time_idx].add(z)
    return jnp.concatenate([out_c, out_t], axis=0)


# Budget for the dense (C, T) weighted bipartite adjacency used by the CG
# matvec — 4 MB at the bench scale (100 x 10k), 400 MB at 10k x 10k.  Past
# it, the per-iteration scatter formulation takes over.
_DENSE_ADJ_BUDGET_BYTES = int(1 << 30)


def _make_normal_mv(k_t2, cam_idx, time_idx, C, T, dtype):
    """CG matvec closure for ``A^T A``: dense when the (C, T) adjacency fits.

    ``A^T A`` of the bipartite incidence system is ``blockdiag(deg) - W``
    with ``W[c, t] = sum of k_t^2 over (c, t) edges``.  TPU scatters
    serialize, so the per-iteration segment-sum matvec costs ~1 ms x O(100)
    CG iterations; materializing ``W`` ONCE (one scatter) turns every
    iteration into two thin MXU matmuls — measured ~7x faster on the
    120k-edge bench problem.
    """
    if C * T * jnp.dtype(dtype).itemsize <= _DENSE_ADJ_BUDGET_BYTES:
        W = jnp.zeros((C, T), dtype).at[cam_idx, time_idx].add(k_t2)
        deg_c = jnp.sum(W, axis=1)
        deg_t = jnp.sum(W, axis=0)

        def mv(x):
            xc, xt = x[:C], x[C:]
            yc = deg_c[:, None] * xc - jnp.matmul(W, xt, precision=HIGHEST)
            yt = deg_t[:, None] * xt - jnp.matmul(W.T, xc, precision=HIGHEST)
            return jnp.concatenate([yc, yt], axis=0)

        return mv
    return lambda x: _normal_matvec(x, k_t2, cam_idx, time_idx, C, T)


def _translation_normal_rhs(t_tilde, k_t, cam_idx, time_idx, C, T):
    kt = k_t[:, None] * t_tilde
    atb_c = -jnp.zeros((C, 3), t_tilde.dtype).at[cam_idx].add(kt)
    atb_t = jnp.zeros((T, 3), t_tilde.dtype).at[time_idx].add(kt)
    return jnp.concatenate([atb_c, atb_t], axis=0)


def _cg(t_tilde, k_t, cam_idx, time_idx, C, T, tol, maxiter):
    b = _translation_normal_rhs(t_tilde, k_t, cam_idx, time_idx, C, T)
    mv = _make_normal_mv(k_t * k_t, cam_idx, time_idx, C, T, t_tilde.dtype)
    x, _ = jax.scipy.sparse.linalg.cg(mv, b, tol=tol, maxiter=maxiter)
    res = jnp.linalg.norm(mv(x) - b) / jnp.maximum(jnp.linalg.norm(b), 1e-30)
    return x, res


@partial(jax.jit, static_argnames=("C", "T", "maxiter"))
def solve_translations_cg(
    t_tilde, k_t, cam_idx, time_idx, *, C: int, T: int, tol=1e-5, maxiter=None
):
    """Conjugate gradient on the normal equations (bipgo.py:476-478).

    Matches SciPy semantics: solve ``A^T A x = A^T b`` from ``x0 = 0`` with
    relative tolerance ``tol``.  The system is singular (global translation
    gauge) but consistent — CG stays in the range space, like the reference.
    Returns ``(x, rel_residual)``; convergence is surfaced, not asserted.
    """
    return _cg(t_tilde, k_t, cam_idx, time_idx, C, T, tol, maxiter)


@partial(jax.jit, static_argnames=("C", "T"))
def se3sync_full(
    R_e,
    t_e,
    k_r,
    k_t,
    cam_idx,
    time_idx,
    marker_idx,
    R_con,
    t_con,
    *,
    root_idx,
    C: int,
    T: int,
    maxiter,
    cg_tol=1e-5,
    cert_tol=1e-6,
):
    """Fused device program: fold -> SO(3) sync -> translation rhs -> CG.

    One dispatch for the whole of ``bipartite_se3sync``'s device work; returns
    ``(SyncResult, t_est (C+T, 3), cg_residual)``.
    """
    KR = fold_constraints(R_e, k_r, marker_idx, R_con, root_idx)
    result = so3_sync(
        KR, k_r, cam_idx, time_idx, C=C, T=T, maxiter=maxiter, cert_tol=cert_tol
    )
    t_tilde = translation_rhs(
        result.r_cam, result.r_time, t_e, k_t, cam_idx, time_idx,
        marker_idx, R_con, t_con, root_idx,
    )
    t_est, res = _cg(t_tilde, k_t, cam_idx, time_idx, C, T, cg_tol, None)
    # Single packed (C+T, 4, 4) pose output: one device->host transfer
    # instead of three (the tunnel is latency/bandwidth bound).
    N = C + T
    poses = jnp.zeros((N, 4, 4), R_e.dtype)
    poses = poses.at[:, 3, 3].set(1.0)
    poses = poses.at[:C, :3, :3].set(result.r_cam)
    poses = poses.at[C:, :3, :3].set(result.r_time)
    poses = poses.at[:, :3, 3].set(t_est)
    return result, poses, res


@partial(jax.jit, static_argnames=("C", "T"))
def se3sync_wire(
    wire,
    con,
    *,
    root_idx,
    C: int,
    T: int,
    maxiter,
    cg_tol=1e-5,
    cert_tol=1e-6,
):
    """se3sync from ONE wire buffer — the minimum-transfer entry point.

    ``con (M, 12)`` = ``[R_con.flatten() | t_con]`` per marker — one
    combined constraint transfer (each separate host->device array costs a
    tunnel round trip).

    ``wire (E, 8)`` float32, 32 bytes/edge:

      cols 0-1  unit quaternion as 4 x int16 (q * 32767), bitcast — the
                quantization adds ~4e-5 rad of rotation noise, two orders
                below the 1e-3 parity budget, for 8 fewer bytes per edge
      cols 2-4  translation (f32)
      cols 5-6  k_r, k_t weights (f32, pre-normalized)
      col  7    bit-packed ``(cam << (tb+mb)) | (time << mb) | marker``
                int32 bitcast (``tb/mb`` = bit widths of T and the marker
                count, static at trace time)

    A single H2D transfer carries the whole per-edge problem; a single D2H
    fetch returns poses + residual (see :func:`se3sync_fused`).
    """
    E = wire.shape[0]
    R_con = con[:, :9].reshape(-1, 3, 3)
    t_con = con[:, 9:]
    qi = lax.bitcast_convert_type(wire[:, 0:2], jnp.int16).reshape(E, 4)
    q_e = qi.astype(wire.dtype) * (1.0 / 32767.0)  # re-normalized in quat_to_mat
    edata = jnp.concatenate([q_e, wire[:, 2:7]], axis=1)
    iv = lax.bitcast_convert_type(wire[:, 7], jnp.int32)
    M = R_con.shape[0]
    mb = max(int(M - 1).bit_length(), 1)
    tb = max(int(T - 1).bit_length(), 1)
    marker_idx = iv & ((1 << mb) - 1)
    time_idx = (iv >> mb) & ((1 << tb) - 1)
    cam_idx = iv >> (mb + tb)
    eidx = jnp.stack([cam_idx, time_idx, marker_idx], axis=1)
    return se3sync_fused(
        edata, eidx, R_con, t_con, root_idx=root_idx, C=C, T=T,
        maxiter=maxiter, cg_tol=cg_tol, cert_tol=cert_tol,
    )


@partial(jax.jit, static_argnames=("C", "T"))
def se3sync_wire2(
    wire,
    con,
    scales,
    *,
    root_idx,
    C: int,
    T: int,
    maxiter,
    cg_tol=1e-5,
    cert_tol=1e-6,
):
    """se3sync from the 24-byte/edge wire (v2) — 25% less H2D than v1.

    Shrinks :func:`se3sync_wire`'s f32 translation/weight columns with two
    more quantizations, both re-expanded on device (the host link is the
    headline solve's largest cost — BASELINE.md roofline):

    ``wire (E, 6)`` float32, 24 bytes/edge:

      cols 0-1  unit quaternion as 4 x int16 (q * 32767), bitcast — as v1
      cols 2-3  translation as 3 x int16 + one spare int16, bitcast;
                ``t = i * scales[0]`` with ``scales[0] = max|t| / 32766``
                (≤ 1.6e-5 · max|t| absolute error per component — 0.23 mm
                on a 15 m scene, two orders below the reference-parity
                budget and three below the measurement noise)
      col  4    noise weights as 2 x int16 log-quantized:
                ``k = exp(-c · i)``, ``i ∈ [0, 32766]``, with per-problem
                log steps ``c = scales[1]`` (k_r) / ``scales[2]`` (k_t).
                Weights are max-normalized to (0, 1] by the packer, so
                ``i = 0`` is the exact max; the packer falls back to the
                f32 wire when the step exceeds 1e-3 relative (i.e. when
                the weight dynamic range exceeds e^32.8 ~ 1.8e14) or any
                weight is non-positive.  Uniform RELATIVE precision across
                the whole range — unlike f16, nothing ever flushes to zero
                (a flushed weight on a leaf edge would sever the graph).
      col  5    bit-packed ``(cam << (tb+mb)) | (time << mb) | marker`` — as v1

    ``scales (4,) f32`` = ``[t_scale, c_r, c_t, reserved]``.
    """
    E = wire.shape[0]
    R_con = con[:, :9].reshape(-1, 3, 3)
    t_con = con[:, 9:]
    qi = lax.bitcast_convert_type(wire[:, 0:2], jnp.int16).reshape(E, 4)
    q_e = qi.astype(wire.dtype) * (1.0 / 32767.0)  # re-normalized in quat_to_mat
    ti = lax.bitcast_convert_type(wire[:, 2:4], jnp.int16).reshape(E, 4)
    t_e = ti[:, :3].astype(wire.dtype) * scales[0]
    ki = lax.bitcast_convert_type(wire[:, 4], jnp.int16)
    k_r = jnp.exp(ki[:, 0].astype(wire.dtype) * (-scales[1]))
    k_t = jnp.exp(ki[:, 1].astype(wire.dtype) * (-scales[2]))
    edata = jnp.concatenate(
        [q_e, t_e, k_r[:, None], k_t[:, None]], axis=1
    )
    iv = lax.bitcast_convert_type(wire[:, 5], jnp.int32)
    M = R_con.shape[0]
    mb = max(int(M - 1).bit_length(), 1)
    tb = max(int(T - 1).bit_length(), 1)
    marker_idx = iv & ((1 << mb) - 1)
    time_idx = (iv >> mb) & ((1 << tb) - 1)
    cam_idx = iv >> (mb + tb)
    eidx = jnp.stack([cam_idx, time_idx, marker_idx], axis=1)
    return se3sync_fused(
        edata, eidx, R_con, t_con, root_idx=root_idx, C=C, T=T,
        maxiter=maxiter, cg_tol=cg_tol, cert_tol=cert_tol,
    )


@partial(jax.jit, static_argnames=("C", "T"))
def se3sync_fused(
    edata,
    eidx,
    R_con,
    t_con,
    *,
    root_idx,
    C: int,
    T: int,
    maxiter,
    cg_tol=1e-5,
    cert_tol=1e-6,
):
    """se3sync from the fused host buffers, minimal-transfer in AND out.

    ``edata (E, 9)`` = ``[q(4) | t(3) | k_r | k_t]``, ``eidx (E, 3)`` =
    ``[cam, time, marker]`` — the exact layout fastpack.c emits, so the whole
    per-edge problem crosses the host link in TWO transfers instead of seven
    (each dispatch chain costs ~26 ms of round-trip on a remote-tunnel host).

    Returns ``(SyncResult, out (C+T+1, 12))`` where rows ``[:C+T]`` hold
    ``[R.flatten() | t]`` world-frame poses (cameras then times) and row
    ``C+T`` carries the CG relative residual in column 0 — one packed D2H
    fetch delivers poses AND the convergence diagnostic.
    """
    q_e = edata[:, :4]
    t_e = edata[:, 4:7]
    k_r = edata[:, 7]
    k_t = edata[:, 8]
    cam_idx, time_idx, marker_idx = eidx[:, 0], eidx[:, 1], eidx[:, 2]
    KR = fold_constraints(q_e, k_r, marker_idx, R_con, root_idx)
    result = so3_sync(
        KR, k_r, cam_idx, time_idx, C=C, T=T, maxiter=maxiter, cert_tol=cert_tol
    )
    t_tilde = translation_rhs(
        result.r_cam, result.r_time, t_e, k_t, cam_idx, time_idx,
        marker_idx, R_con, t_con, root_idx,
    )
    t_est, res = _cg(t_tilde, k_t, cam_idx, time_idx, C, T, cg_tol, None)
    N = C + T
    out = jnp.zeros((N + 1, 12), edata.dtype)
    out = out.at[:C, :9].set(result.r_cam.reshape(C, 9))
    out = out.at[C:N, :9].set(result.r_time.reshape(T, 9))
    out = out.at[:N, 9:].set(t_est)
    out = out.at[N, 0].set(res.astype(edata.dtype))
    return result, out


@partial(jax.jit, static_argnames=("C", "T", "maxiter"))
def solve_translations_lsqr(
    t_tilde, k_t, cam_idx, time_idx, *, C: int, T: int, atol=1e-8, btol=1e-8, maxiter=None
):
    """Jitted LSQR (Paige & Saunders) on the incidence operator.

    Replaces the reference's "direct" path (``scipy.sparse.linalg.lsqr``,
    bipgo.py:479-480 — itself an iterative Golub-Kahan method) without ever
    materializing A.  Stops on the standard LSQR residual tests.
    """
    E = t_tilde.shape[0]
    N = C + T
    if maxiter is None:
        maxiter = 2 * N

    def A(x):  # (N,3) -> (E,3)
        return k_t[:, None] * (x[C:][time_idx] - x[:C][cam_idx])

    def At(y):  # (E,3) -> (N,3)
        ky = k_t[:, None] * y
        return jnp.concatenate(
            [
                -jnp.zeros((C, 3), y.dtype).at[cam_idx].add(ky),
                jnp.zeros((T, 3), y.dtype).at[time_idx].add(ky),
            ],
            axis=0,
        )

    # LSQR's scalar recurrences (alpha, beta) differ per coordinate column, so
    # the whole bidiagonalization is vmapped over the 3 coordinate axes.
    def lsqr_1d(b):
        beta0 = jnp.linalg.norm(b)
        u = b / jnp.maximum(beta0, 1e-30)
        v0 = At_col(u)
        alpha0 = jnp.linalg.norm(v0)
        v = v0 / jnp.maximum(alpha0, 1e-30)
        w = v
        x = jnp.zeros((N,), b.dtype)

        # Stopping follows SciPy's lsqr test 2: ||A^T r|| <= atol * ||A|| *
        # ||r||, with ||A|| accumulated as sqrt(sum alpha^2 + beta^2).
        # Running past Krylov exhaustion (alpha -> 0 on rank-deficient
        # incidence systems) makes the recurrences diverge, so this test is
        # load-bearing, not an optimization.
        def cond_fn(s):
            i, x, u, v, w, alpha, phibar, rhobar, anorm2, normar = s
            anorm = jnp.sqrt(anorm2)
            return (i < maxiter) & (normar > atol * anorm * jnp.abs(phibar) + 1e-30)

        def body_fn(s):
            i, x, u, v, w, alpha, phibar, rhobar, anorm2, _ = s
            u1 = A_col(v) - alpha * u
            beta = jnp.linalg.norm(u1)
            u1 = u1 / jnp.maximum(beta, 1e-30)
            v1 = At_col(u1) - beta * v
            alpha1 = jnp.linalg.norm(v1)
            v1 = v1 / jnp.maximum(alpha1, 1e-30)
            rho = jnp.sqrt(rhobar * rhobar + beta * beta)
            c = rhobar / jnp.maximum(rho, 1e-30)
            sgn = beta / jnp.maximum(rho, 1e-30)
            theta = sgn * alpha1
            rhobar1 = -c * alpha1
            phi = c * phibar
            phibar1 = sgn * phibar
            x1 = x + (phi / jnp.maximum(rho, 1e-30)) * w
            w1 = v1 - (theta / jnp.maximum(rho, 1e-30)) * w
            anorm2_1 = anorm2 + alpha * alpha + beta * beta
            normar = jnp.abs(phibar1) * alpha1 * jnp.abs(c)
            return (i + 1, x1, u1, v1, w1, alpha1, phibar1, rhobar1, anorm2_1, normar)

        init = (
            jnp.zeros((), jnp.int32),
            x,
            u,
            v,
            w,
            alpha0,
            beta0,
            alpha0,
            alpha0 * alpha0,
            alpha0 * beta0,
        )
        out = lax.while_loop(cond_fn, body_fn, init)
        return out[1]

    # Column-wise operators for the vmapped scalar LSQR.
    def A_col(x):
        return k_t * (x[C:][time_idx] - x[:C][cam_idx])

    def At_col(y):
        ky = k_t * y
        return jnp.concatenate(
            [
                -jnp.zeros((C,), y.dtype).at[cam_idx].add(ky),
                jnp.zeros((T,), y.dtype).at[time_idx].add(ky),
            ]
        )

    x_cols = jax.vmap(lsqr_1d, in_axes=1, out_axes=1)(t_tilde)
    res = jnp.linalg.norm(At(A(x_cols) - t_tilde)) / jnp.maximum(
        jnp.linalg.norm(At(t_tilde)), 1e-30
    )
    return x_cols, res

"""Large-graph SO(3) sync: the 10k-camera / million-edge path.

The default solver (:mod:`vican_tpu.solver.core`) materializes the block
tensor ``B (C, 3, T, 3)`` — perfect up to ~1k cameras, impossible at
C = 10k, T = 10k (3.6 GB logical, but TPU tiled layouts pad the minor-most
dim 3 to 128: ~1.5 TB resident — and the dense per-iteration ``eigh`` is
O((3C)^3), measured 1.6 s at 3C = 6000).  This module keeps the same
primal-dual algorithm (reference vican/bipgo.py:145-350) with two scale
substitutions:

1. **Chunked power-graph accumulation**: edges are sorted by timestep on the
   host; the device loops over fixed-size time chunks, scatters each chunk's
   edges into a small ``(C, 3, Tc, 3)`` block, and accumulates
   ``R~ += B_c Lambda_c B_c^T`` — the dense (3C, 3C) power graph (3.6 GB at
   C = 10k) is built by a stream of MXU matmuls without any T-sized dense
   intermediate.
2. **CheFSI eigensolver**: the bottom-5 eigenpairs of the (3C, 3C) Laplacian
   come from scaled Chebyshev-filtered subspace iteration (warm-started
   across primal-dual iterations), replacing the dense ``eigh``
   (O((3C)^3) is minutes at 30k) and filling the role of ARPACK
   shift-invert in the reference (bipgo.py:288) — plain or
   flipped-spectrum power methods stall when lambda_4 << lambda_max.

Per-time-node dual updates remain embarrassingly parallel vmapped SVDs; the
``R_ct^T r`` products reuse the chunked blocks.  This is the "sequence
parallel" axis of SURVEY.md §5 — multi-chip sharding splits the chunk stream
across devices and ``psum``s the (3C, 3C) partials.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.lie import project_so3, svd3_so3
from .core import HIGHEST, SyncResult

__all__ = ["sort_edges_by_time", "so3_sync_large", "so3_sync_large_sharded"]


def sort_edges_by_time(KR, k_r, cam_idx, time_idx, T: int, chunk_t: int):
    """Host-side preparation: sort edges by timestep and chunk uniformly.

    Returns ``(KR_s, k_r_s, cam_s, tloc_s, chunk_of_edge)`` where edges are
    grouped into ``ceil(T / chunk_t)`` chunks of equal edge capacity (padded
    with zero-weight edges), ``tloc`` is the timestep index local to the
    chunk.  All outputs are NumPy; shapes are static for the device loop.
    """
    KR = np.asarray(KR)
    k_r = np.asarray(k_r)
    cam_idx = np.asarray(cam_idx)
    time_idx = np.asarray(time_idx)

    n_chunks = -(-T // chunk_t)
    chunk_of = time_idx // chunk_t
    order = np.argsort(chunk_of, kind="stable")
    KR, k_r, cam_idx, time_idx, chunk_of = (
        KR[order], k_r[order], cam_idx[order], time_idx[order], chunk_of[order]
    )
    counts = np.bincount(chunk_of, minlength=n_chunks)
    cap = int(counts.max()) if len(counts) else 1

    KR_s = np.zeros((n_chunks, cap, 3, 3), KR.dtype)
    k_s = np.zeros((n_chunks, cap), k_r.dtype)
    cam_s = np.zeros((n_chunks, cap), np.int32)
    tloc_s = np.zeros((n_chunks, cap), np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for c in range(n_chunks):
        s, e = starts[c], starts[c + 1]
        n = e - s
        KR_s[c, :n] = KR[s:e]
        k_s[c, :n] = k_r[s:e]
        cam_s[c, :n] = cam_idx[s:e]
        tloc_s[c, :n] = time_idx[s:e] - c * chunk_t
    return KR_s, k_s, cam_s, tloc_s


def _estimate_lmax(L, iters: int = 16, prec=HIGHEST):
    """Largest eigenvalue of symmetric PSD-ish L via power iteration."""
    n = L.shape[0]
    v = jnp.cos(jnp.arange(n, dtype=L.dtype))  # deterministic start
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = jnp.matmul(L, v, precision=prec)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = lax.fori_loop(0, iters, body, v)
    return jnp.vdot(v, jnp.matmul(L, v, precision=prec))


def _cheb_filter(L, X, deg: int, a, b, a0=0.0, prec=HIGHEST):
    """Scaled Chebyshev filter (Zhou et al. CheFSI): damp [a, b], amplify
    the spectrum below ``a`` (where the Laplacian kernel lives)."""
    e = (b - a) * 0.5
    c = (b + a) * 0.5
    sigma1 = e / (a0 - c)
    tau = 2.0 / sigma1  # fixed by the first sigma (three-term recurrence)

    def mv(X):
        return jnp.matmul(L, X, precision=prec)

    Y = (mv(X) - c * X) * (sigma1 / e)

    def body(_, state):
        X, Y, sigma = state
        sigma2 = 1.0 / (tau - sigma)
        Ynew = 2.0 * (sigma2 / e) * (mv(Y) - c * Y) - (sigma * sigma2) * X
        return (Y, Ynew, sigma2)

    X, Y, _ = lax.fori_loop(0, deg - 1, body, (X, Y, sigma1))
    return Y


def _chefsi_bottom(L, X, k: int, deg: int, rounds: int, prec=HIGHEST):
    """Bottom-k eigenpairs via Chebyshev-filtered subspace iteration.

    ``X (n, m)`` with m >= k is the (warm-startable) subspace; returns
    ``(evals ascending (k,), vectors (n, k), X_next (n, m))``.  The filter
    suppresses [0.05 * lmax, lmax], so the near-kernel directions the
    primal rounding needs converge in a couple of rounds — unlike plain or
    flipped-spectrum power methods whose rate collapses when
    lambda_4 << lmax (the regime ARPACK's shift-invert handles in the
    reference, bipgo.py:288).
    """
    lmax = _estimate_lmax(L, prec=prec) * 1.05
    a = 0.05 * lmax

    def round_body(_, X):
        Xf = _cheb_filter(L, X, deg, a, lmax, prec=prec)
        Q, _ = jnp.linalg.qr(Xf)
        return Q

    Q = lax.fori_loop(0, rounds, round_body, X)
    # Rayleigh-Ritz always at full precision: the certificate eigenvalues
    # come from here
    S = jnp.matmul(Q.T, jnp.matmul(L, Q, precision=HIGHEST), precision=HIGHEST)
    S = 0.5 * (S + S.T)
    theta, W = jnp.linalg.eigh(S)  # ascending
    V = jnp.matmul(Q, W, precision=HIGHEST)
    return theta[:k], V[:, :k], V


@partial(jax.jit, static_argnames=("C", "T", "chunk_t", "cheb_degree", "cheb_rounds", "cheb_degree_warm", "subspace", "precision"))
def so3_sync_large(
    KR_s,
    k_s,
    cam_s,
    tloc_s,
    *,
    C: int,
    T: int,
    chunk_t: int,
    maxiter,
    cert_tol=1e-6,
    cheb_degree: int = 60,
    cheb_rounds: int = 2,
    cheb_degree_warm: int = 60,
    subspace: int = 10,
    precision: str = "highest",
) -> SyncResult:
    """Primal-dual SO(3) sync without the dense (C, 3, T, 3) block tensor.

    Inputs are the chunked edge arrays from :func:`sort_edges_by_time`.
    Mathematically identical to :func:`vican_tpu.solver.core.so3_sync`
    (same init, update order and certificate — bipgo.py:145-350); tested for
    parity in tests/test_scale.py.

    The first iteration runs the full Chebyshev budget (``cheb_degree`` x
    ``cheb_rounds``); subsequent iterations start from the warm subspace —
    the power graph moves only O(dual-update) per iteration — and need a
    single light filter pass (``cheb_degree_warm``).

    ``precision``: matmul precision of the BIG contractions (power graph,
    Chebyshev matvecs, time products).  ``"highest"`` = full f32;
    ``"high"`` (3-pass bf16, ~1e-5 relative) is ~40% faster end-to-end at
    C = 10k and perturbs the recovered rotations by only ~(matmul error /
    spectral gap) ~ 1e-5 rad, far below the 1e-3 parity budget — but the
    certificate eigenvalues coarsen from ~3e-4 to ~1.4e-3 (still 1e5 x
    below the eigengap).  Rayleigh-Ritz and all 3x3 block algebra stay at
    full precision either way.
    """
    prec = {"highest": HIGHEST, "high": lax.Precision.HIGH}[precision]
    dtype = KR_s.dtype
    n_chunks, cap = k_s.shape

    deg_t = jnp.zeros((n_chunks, chunk_t), dtype)
    deg_t = jax.vmap(lambda d, t, k: d.at[t].add(k))(deg_t, tloc_s, k_s)
    deg_c = jnp.zeros((C,), dtype).at[cam_s.reshape(-1)].add(k_s.reshape(-1))

    # All chunk tensors stay strictly 2-D: TPU tiled layouts pad the
    # minor-most dimension to 128, so a (C, 3, Tc, 3) block would cost 42x
    # its logical size in HBM.  A chunk is a (3C, 3*Tc) matrix; the time
    # dual is applied blockwise (apply_lbd), never as a dense 3Tc matmul.
    three_c = 3 * C
    three_t = 3 * chunk_t
    a3 = jnp.arange(3, dtype=jnp.int32)

    def chunk_block(c):
        """Scatter chunk c's edges into a (3C, 3*Tc) matrix."""
        rows = 3 * cam_s[c][:, None, None] + a3[None, :, None]
        cols = 3 * tloc_s[c][:, None, None] + a3[None, None, :]
        return jnp.zeros((three_c, three_t), dtype).at[rows, cols].add(KR_s[c])

    # The chunk blocks are loop-invariant (only Lambda_T changes between
    # iterations), and TPU scatters serialize — rebuilding them inside every
    # power-graph/time-product pass dominated the solve.  Materialize them
    # ONCE when they fit the HBM budget (3C*3T*4 bytes — 3.6 GB at
    # C = T = 10k); past the budget fall back to streaming re-scatter (the
    # >HBM regime this module exists for).
    materialize = (
        n_chunks * three_c * three_t * jnp.dtype(dtype).itemsize
        <= int(6e9)
    )
    if materialize:
        Bs = lax.map(chunk_block, jnp.arange(n_chunks, dtype=jnp.int32))
        get_block = lambda c: Bs[c]
    else:
        get_block = chunk_block

    def apply_lbd(B, lbd_t, c):
        """B @ blockdiag(chunk c's time duals), applied blockwise.

        The dense (3Tc, 3Tc) block-diagonal matmul would spend ~Tc x its
        flops on structural zeros; the (3C, Tc, 3) x (Tc, 3, 3) einsum costs
        only the nonzero blocks and keeps the ONE big MXU matmul per chunk
        the Y @ B^T accumulation below.
        """
        lc = lax.dynamic_slice(lbd_t, (c * chunk_t, 0, 0), (chunk_t, 3, 3))
        Y = jnp.einsum(
            "atb,tbd->atd", B.reshape(three_c, chunk_t, 3), lc, precision=HIGHEST
        )
        return Y.reshape(three_c, three_t)

    def power_graph(lbd_t):
        """R~ = sum_c B_c Lambda_c B_c^T accumulated over time chunks.

        Bandwidth note: the (3C, 3C) accumulator is re-read/written once per
        chunk, so larger ``chunk_t`` (fewer chunks) amortizes that traffic —
        the dominant cost at C ~ 10k where the accumulator is gigabytes.
        """

        def body(c, acc):
            B = get_block(c)
            Y = apply_lbd(B, lbd_t, c)
            return acc + jnp.matmul(Y, B.T, precision=prec)

        return lax.fori_loop(0, n_chunks, body, jnp.zeros((three_c, three_c), dtype))

    def time_products(r_c):
        """rt_raw[t] = sum_i M_it^T r_c[i], chunked over time."""
        r_flat = r_c.reshape(three_c, 3)

        def body(c, acc):
            B = get_block(c)
            rt = jnp.matmul(B.T, r_flat, precision=prec)  # (3*Tc, 3)
            return lax.dynamic_update_slice(acc, rt.reshape(chunk_t, 3, 3), (c * chunk_t, 0, 0))

        return lax.fori_loop(0, n_chunks, body, jnp.zeros((n_chunks * chunk_t, 3, 3), dtype))

    eye3 = jnp.eye(3, dtype=dtype)
    lbd_t0 = (eye3 / jnp.maximum(deg_t.reshape(-1), 1e-30)[:, None, None])
    lbd_c0 = deg_c[:, None, None] * eye3

    def cond(state):
        it, max_eval, *_ = state
        return (it < maxiter) & (max_eval > cert_tol)

    def body(state):
        it, _, lbd_c, lbd_t, _, _, _, _, X = state

        pwr = power_graph(lbd_t)
        # diagonal-block add in 2-D indexing (a (C,3,C,3) view would cost a
        # 42x padded layout at this scale)
        cc = jnp.arange(C, dtype=jnp.int32)
        rows = 3 * cc[:, None, None] + a3[None, :, None]
        cols = 3 * cc[:, None, None] + a3[None, None, :]
        L = (-pwr).at[rows, cols].add(lbd_c)
        L = 0.5 * (L + L.T)

        scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(L))), 1e-30)
        evals5, V5, X_next = lax.cond(
            it == 0,
            lambda: _chefsi_bottom(L / scale, X, 5, cheb_degree, cheb_rounds, prec=prec),
            lambda: _chefsi_bottom(L / scale, X, 5, cheb_degree_warm, 1, prec=prec),
        )
        evals5 = evals5 * scale
        eigengap = jnp.abs(evals5[3] / evals5[2])
        max_eval = jnp.max(jnp.abs(evals5))

        V3 = V5[:, :3]
        r = jnp.matmul(V3, jnp.linalg.inv(V3[:3, :3]), precision=HIGHEST)
        r_blocks = project_so3(r.reshape(C, 3, 3))

        rtr = jnp.matmul(pwr, r_blocks.reshape(3 * C, 3), precision=HIGHEST).reshape(C, 3, 3)
        r_c, u, s, _ = svd3_so3(rtr)
        lbd_c_new = jnp.einsum("cab,cb,cdb->cad", u, s, u, precision=HIGHEST)

        rt_raw = time_products(r_c)
        r_t, ut, st, _ = svd3_so3(rt_raw)
        # pseudo-inverse guard: a (near-)rank-deficient time block would put
        # ~1e30 into Lambda_T and blow up the next power graph; zeroing the
        # tiny directions is the stable generalization of bipgo.py:329.
        st_inv = jnp.where(st > 1e-9 * st[..., :1], 1.0 / jnp.maximum(st, 1e-30), 0.0)
        lbd_t_new = jnp.einsum("tab,tb,tdb->tad", ut, st_inv, ut, precision=HIGHEST)

        return (it + 1, max_eval, lbd_c_new, lbd_t_new, r_c, r_t, evals5, eigengap, X_next)

    # deterministic subspace start (warm-started across iterations)
    n = 3 * C
    ii = jnp.arange(n, dtype=dtype)[:, None]
    jj = jnp.arange(subspace, dtype=dtype)[None, :]
    X0 = jnp.cos(ii * (jj + 1.0) * 0.37 + jj)
    X0, _ = jnp.linalg.qr(X0)

    init = (
        jnp.zeros((), jnp.int32),
        jnp.asarray(1.0, dtype),
        lbd_c0,
        lbd_t0,
        jnp.broadcast_to(eye3, (C, 3, 3)),
        jnp.broadcast_to(eye3, (n_chunks * chunk_t, 3, 3)),
        jnp.zeros((5,), dtype),
        jnp.asarray(0.0, dtype),
        X0,
    )
    it, _, _, _, r_c, r_t, evals5, eigengap, _ = lax.while_loop(cond, body, init)

    return SyncResult(
        r_cam=jnp.swapaxes(r_c, -1, -2),
        r_time=jnp.swapaxes(r_t[:T], -1, -2),
        evals=evals5,
        eigengap=eigengap,
        num_iters=it,
    )


def so3_sync_large_sharded(
    KR_s,
    k_s,
    cam_s,
    tloc_s,
    *,
    C: int,
    T: int,
    chunk_t: int,
    maxiter: int,
    mesh,
    cert_tol=1e-6,
    cheb_degree: int = 60,
    cheb_rounds: int = 2,
    cheb_degree_warm: int = 60,
    subspace: int = 10,
    precision: str = "highest",
) -> SyncResult:
    """Multi-chip large-graph SO(3) sync: the chunk stream sharded over the
    mesh's first axis.

    Each device loops over its local time chunks, accumulating a partial
    (3C, 3C) power graph; ``psum`` over ICI combines the partials.  The
    camera-block state (Laplacian, CheFSI eigensolve, duals) is replicated —
    it is tiny by the power-graph construction.  Time-node state (Lambda_T,
    r_t, per-time SVDs) stays sharded with its chunks.  This is SURVEY.md
    §5's "sequence parallelism" made concrete.
    """
    import numpy as _np
    from jax.sharding import PartitionSpec as P

    prec = {"highest": HIGHEST, "high": lax.Precision.HIGH}[precision]
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n_chunks = KR_s.shape[0]
    pad_chunks = (-n_chunks) % n_dev
    if pad_chunks:
        padz = lambda a: _np.concatenate(
            [_np.asarray(a), _np.zeros((pad_chunks,) + a.shape[1:], _np.asarray(a).dtype)]
        )
        KR_s, k_s, cam_s, tloc_s = map(padz, (KR_s, k_s, cam_s, tloc_s))
        n_chunks += pad_chunks
    dtype = _np.asarray(KR_s).dtype
    T_pad = n_chunks * chunk_t

    def body_fn(KR_l, k_l, cam_l, tloc_l):
        """Per-device: local chunks (nc_local, cap, ...)."""
        nc_local = k_l.shape[0]
        three_c = 3 * C
        three_t = 3 * chunk_t
        a3 = jnp.arange(3, dtype=jnp.int32)

        deg_t_l = jax.vmap(lambda t, k: jnp.zeros((chunk_t,), dtype).at[t].add(k))(
            tloc_l, k_l
        )
        deg_c = jax.lax.psum(
            jnp.zeros((C,), dtype).at[cam_l.reshape(-1)].add(k_l.reshape(-1)), axis
        )

        def chunk_block(c):
            rows = 3 * cam_l[c][:, None, None] + a3[None, :, None]
            cols = 3 * tloc_l[c][:, None, None] + a3[None, None, :]
            return jnp.zeros((three_c, three_t), dtype).at[rows, cols].add(KR_l[c])

        # loop-invariant blocks materialized once per device when they fit
        # (see the single-chip variant)
        if nc_local * three_c * three_t * jnp.dtype(dtype).itemsize <= int(6e9):
            Bs_l = lax.map(chunk_block, jnp.arange(nc_local, dtype=jnp.int32))
            get_block = lambda c: Bs_l[c]
        else:
            get_block = chunk_block

        def apply_lbd(B, lbd_t_l, c):
            # blockwise Lambda application (see the single-chip variant)
            lc = lax.dynamic_slice(lbd_t_l, (c * chunk_t, 0, 0), (chunk_t, 3, 3))
            Y = jnp.einsum(
                "atb,tbd->atd", B.reshape(three_c, chunk_t, 3), lc, precision=HIGHEST
            )
            return Y.reshape(three_c, three_t)

        def power_graph(lbd_t_l):
            def body(c, acc):
                B = get_block(c)
                Y = apply_lbd(B, lbd_t_l, c)
                return acc + jnp.matmul(Y, B.T, precision=prec)

            local = lax.fori_loop(0, nc_local, body, jnp.zeros((three_c, three_c), dtype))
            return jax.lax.psum(local, axis)

        def time_products(r_c):
            r_flat = r_c.reshape(three_c, 3)

            def body(c, acc):
                B = get_block(c)
                rt = jnp.matmul(B.T, r_flat, precision=prec)
                return lax.dynamic_update_slice(
                    acc, rt.reshape(chunk_t, 3, 3), (c * chunk_t, 0, 0)
                )

            return lax.fori_loop(
                0, nc_local, body, jnp.zeros((nc_local * chunk_t, 3, 3), dtype)
            )

        eye3 = jnp.eye(3, dtype=dtype)
        lbd_t0 = eye3 / jnp.maximum(deg_t_l.reshape(-1), 1e-30)[:, None, None]
        lbd_c0 = deg_c[:, None, None] * eye3

        def cond(state):
            it, max_eval, *_ = state
            return (it < maxiter) & (max_eval > cert_tol)

        def body(state):
            it, _, lbd_c, lbd_t_l, _, _, _, _, X = state
            pwr = power_graph(lbd_t_l)
            cc2 = jnp.arange(C, dtype=jnp.int32)
            rows = 3 * cc2[:, None, None] + a3[None, :, None]
            cols = 3 * cc2[:, None, None] + a3[None, None, :]
            L = (-pwr).at[rows, cols].add(lbd_c)
            L = 0.5 * (L + L.T)

            scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(L))), 1e-30)
            evals5, V5, X_next = lax.cond(
                it == 0,
                lambda: _chefsi_bottom(L / scale, X, 5, cheb_degree, cheb_rounds, prec=prec),
                lambda: _chefsi_bottom(L / scale, X, 5, cheb_degree_warm, 1, prec=prec),
            )
            evals5 = evals5 * scale
            eigengap = jnp.abs(evals5[3] / evals5[2])
            max_eval = jnp.max(jnp.abs(evals5))

            V3 = V5[:, :3]
            r = jnp.matmul(V3, jnp.linalg.inv(V3[:3, :3]), precision=HIGHEST)
            r_blocks = project_so3(r.reshape(C, 3, 3))

            rtr = jnp.matmul(pwr, r_blocks.reshape(3 * C, 3), precision=HIGHEST).reshape(C, 3, 3)
            r_c, u, sv, _ = svd3_so3(rtr)
            lbd_c_new = jnp.einsum("cab,cb,cdb->cad", u, sv, u, precision=HIGHEST)

            rt_raw = time_products(r_c)
            r_t_l, ut, st, _ = svd3_so3(rt_raw)
            st_inv = jnp.where(st > 1e-9 * st[..., :1], 1.0 / jnp.maximum(st, 1e-30), 0.0)
            lbd_t_new = jnp.einsum("tab,tb,tdb->tad", ut, st_inv, ut, precision=HIGHEST)

            return (it + 1, max_eval, lbd_c_new, lbd_t_new, r_c, r_t_l, evals5, eigengap, X_next)

        n = 3 * C
        ii = jnp.arange(n, dtype=dtype)[:, None]
        jj = jnp.arange(subspace, dtype=dtype)[None, :]
        X0 = jnp.cos(ii * (jj + 1.0) * 0.37 + jj)
        X0, _ = jnp.linalg.qr(X0)

        init = (
            jnp.zeros((), jnp.int32),
            jnp.asarray(1.0, dtype),
            lbd_c0,
            lbd_t0,
            jnp.broadcast_to(eye3, (C, 3, 3)),
            jnp.broadcast_to(eye3, (nc_local * chunk_t, 3, 3)),
            jnp.zeros((5,), dtype),
            jnp.asarray(0.0, dtype),
            X0,
        )
        it, _, _, _, r_c, r_t_l, evals5, eigengap = lax.while_loop(cond, body, init)[:8]
        return (
            jnp.swapaxes(r_c, -1, -2),
            jnp.swapaxes(r_t_l, -1, -2),
            evals5,
            eigengap,
            it,
        )

    sharded = jax.shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis), P(), P(), P()),
        check_vma=False,
    )
    with jax.default_matmul_precision("highest"):
        r_cam, r_time, evals5, eigengap, it = jax.jit(sharded)(
            jnp.asarray(KR_s), jnp.asarray(k_s), jnp.asarray(cam_s), jnp.asarray(tloc_s)
        )
    return SyncResult(
        r_cam=r_cam, r_time=r_time[:T], evals=evals5, eigengap=eigengap, num_iters=it
    )

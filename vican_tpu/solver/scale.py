"""Large-graph SO(3) sync: the 10k-camera / million-edge path.

The default solver (:mod:`vican_tpu.solver.core`) materializes the block
tensor ``B (C, 3, T, 3)`` — perfect up to ~1k cameras, impossible at
C = 10k, T = 10k (3.6 GB logical, but TPU tiled layouts pad the minor-most
dim 3 to 128: ~1.5 TB resident — and the dense per-iteration ``eigh`` is
O((3C)^3), measured 1.6 s at 3C = 6000).  This module keeps the same
primal-dual algorithm (reference vican/bipgo.py:145-350) with three scale
substitutions:

1. **Flat block operator**: edges are sorted by timestep on the host and
   scattered ONCE into a single (3C, 3T) matrix ``B`` (it is loop-invariant
   — only the duals move between iterations), so every graph product is one
   large MXU matmul.  (A per-chunk ``fori_loop`` formulation of the same
   math measured ~2.5x slower: XLA cannot stream dynamically-sliced 450 MB
   operands the way it streams one resident matrix.)
2. **Matrix-free power graph**: the power graph ``R~ = B Lambda_T B^T``
   (bipgo.py:273,334) is NEVER materialized.  Every consumer needs only
   ``R~ @ X`` for a thin ``X`` (the eigensolver subspace, width ~10; the
   primal/dual products, width 3), and ``R~ X = B (Lambda_T (B^T X))``
   costs ~100x fewer flops than the dense (3C, 3T)x(3T, 3C) build.  The
   solve becomes HBM-bandwidth-bound on reads of ``B``.
3. **CheFSI eigensolver**: the bottom-5 eigenpairs of the (3C, 3C) Laplacian
   come from scaled Chebyshev-filtered subspace iteration (warm-started
   across primal-dual iterations), replacing the dense ``eigh`` and filling
   the role of ARPACK shift-invert in the reference (bipgo.py:288) — plain
   or flipped-spectrum power methods stall when lambda_4 << lambda_max.
   Filter matvecs run on a **bfloat16 copy** of the blocks (halves the
   bandwidth of the dominant loop); a short full-precision polish filter
   pass re-damps the ~1e-3 bf16 subspace contamination before the
   (always full-precision) Rayleigh-Ritz extraction, so the certificate
   eigenvalues and the recovered rotations keep f32 quality.

Per-time-node dual updates remain embarrassingly parallel vmapped SVDs; the
``R_ct^T r`` products reuse ``B``.  This is the "sequence parallel" axis of
SURVEY.md §5 — multi-chip sharding splits the time axis (as equal chunk
groups) across devices, each holding its local column block of ``B``, and
``psum``s each matvec's (3C, width) partial.

Past an HBM budget for the materialized operator the solver falls back to
per-chunk streaming re-scatter with a per-iteration dense power graph —
that regime trades speed for unbounded T.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.lie import project_so3, svd3_so3
from .core import HIGHEST, HIST_CAP, SyncResult

__all__ = [
    "sort_edges_by_time",
    "sort_edges_by_time_wire",
    "so3_sync_large",
    "so3_sync_large_sharded",
]

# HBM budget for materializing the loop-invariant chunk blocks (plus their
# bf16 filter copy); past it the streaming fallback kicks in.
_MATERIALIZE_BUDGET_BYTES = int(6e9)


def _chunk_pack(arrays, pad_values, time_idx, T: int, chunk_t: int):
    """Sort edges by time chunk and pack into ``ceil(T/chunk_t)`` chunks of
    equal edge capacity.  ``arrays``: per-edge arrays to chunk (first axis
    E); ``pad_values``: fill for the padded tail of each.  Returns the
    chunked arrays plus ``tloc_s`` (timestep local to its chunk)."""
    time_idx = np.asarray(time_idx)
    n_chunks = -(-T // chunk_t)
    chunk_of = time_idx // chunk_t
    order = np.argsort(chunk_of, kind="stable")
    time_idx = time_idx[order]
    chunk_of = chunk_of[order]
    counts = np.bincount(chunk_of, minlength=n_chunks)
    cap = int(counts.max()) if len(counts) else 1
    starts = np.concatenate([[0], np.cumsum(counts)])

    outs = []
    for a, pad in zip(arrays, pad_values):
        a = np.asarray(a)[order]
        out = np.empty((n_chunks, cap) + a.shape[1:], a.dtype)
        out[...] = pad
        for c in range(n_chunks):
            s, e = starts[c], starts[c + 1]
            out[c, : e - s] = a[s:e]
        outs.append(out)

    tloc_s = np.zeros((n_chunks, cap), np.int32)
    for c in range(n_chunks):
        s, e = starts[c], starts[c + 1]
        tloc_s[c, : e - s] = time_idx[s:e] - c * chunk_t
    return outs, tloc_s


def sort_edges_by_time(KR, k_r, cam_idx, time_idx, T: int, chunk_t: int):
    """Host-side preparation: sort edges by timestep and chunk uniformly.

    Returns ``(KR_s, k_r_s, cam_s, tloc_s)`` where edges are grouped into
    ``ceil(T / chunk_t)`` chunks of equal edge capacity (padded with
    zero-weight edges), ``tloc`` is the timestep index local to the chunk.
    All outputs are NumPy; shapes are static for the device loop.
    """
    (KR_s, k_s, cam_s), tloc_s = _chunk_pack(
        (KR, k_r, np.asarray(cam_idx, np.int32)), (0, 0, 0), time_idx, T, chunk_t
    )
    return KR_s, k_s, cam_s, tloc_s


def sort_edges_by_time_wire(R_fold, k_r, cam_idx, time_idx, T: int, chunk_t: int):
    """Compact-wire variant of :func:`sort_edges_by_time` for remote hosts.

    ``R_fold (E, 3, 3)``: UNWEIGHTED folded edge rotations
    (``R_e R_m^T R_0``, bipgo.py:209-213 without the weight).  Rotations
    cross the host link as int16-quantized quaternions — 8 bytes/edge
    instead of 36 (the link is bandwidth-bound; quantization adds ~4e-5 rad,
    two orders below the 1e-3 parity budget, matching the main solver's
    wire format in core.se3sync_wire).  Padded slots carry the identity
    quaternion with zero weight (quat_to_mat normalizes, so an all-zero pad
    would produce NaN).

    Returns ``(q16_s (nc, cap, 4) int16, k_s, cam_s, tloc_s)`` — accepted
    directly by :func:`so3_sync_large` / :func:`so3_sync_large_sharded` in
    place of ``KR_s``.
    """
    from .packing import _mat_to_quat

    q = _mat_to_quat(np.asarray(R_fold, np.float64))
    q16 = np.clip(np.round(q * 32767.0), -32767, 32767).astype(np.int16)
    ident = np.array([32767, 0, 0, 0], np.int16)
    (q16_s, k_s, cam_s), tloc_s = _chunk_pack(
        (q16, k_r, np.asarray(cam_idx, np.int32)), (ident, 0, 0),
        time_idx, T, chunk_t,
    )
    return q16_s, k_s, cam_s, tloc_s


def _cheb_filter(mv, X, deg: int, a, b, a0=0.0):
    """Scaled Chebyshev filter (Zhou et al. CheFSI): damp [a, b], amplify
    the spectrum below ``a`` (where the Laplacian kernel lives).  ``mv`` is
    the (scaled-operator) matvec closure on (n, w) blocks."""
    e = (b - a) * 0.5
    c = (b + a) * 0.5
    sigma1 = e / (a0 - c)
    tau = 2.0 / sigma1  # fixed by the first sigma (three-term recurrence)

    Y = (mv(X) - c * X) * (sigma1 / e)

    def body(_, state):
        X, Y, sigma = state
        sigma2 = 1.0 / (tau - sigma)
        Ynew = 2.0 * (sigma2 / e) * (mv(Y) - c * Y) - (sigma * sigma2) * X
        return (Y, Ynew, sigma2)

    X, Y, _ = lax.fori_loop(0, deg - 1, body, (X, Y, sigma1))
    return Y


def _lmax_refine(mv, v, iters: int):
    """Warm-startable power iteration for the scaled operator's lambda_max.

    ``v (n, 1)``; returns (rayleigh quotient, refined v).  Carried across
    primal-dual iterations — the Laplacian moves only O(dual update), so a
    few refinement steps keep the Chebyshev window valid.
    """

    def body(_, v):
        w = mv(v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = lax.fori_loop(0, iters, body, v)
    return jnp.sum(v * mv(v)), v


def _lmax_lanczos(mv, v0, k: int):
    """Safeguarded Lanczos upper bound for lambda_max of an SPD operator.

    Returns ``(bound, ritz_vec (n, 1))`` with ``bound = theta_max + beta_k``
    — the standard CheFSI upper-bound estimator (Zhou et al.): the residual
    norm of the top Ritz pair bounds its distance to a true eigenvalue, so
    ``theta + beta`` upper-bounds lambda_max even when the top of the
    spectrum is a near-degenerate cluster where single-vector power
    iteration badly underestimates (a Chebyshev window BELOW lambda_max
    amplifies the above-window components and wrecks the filtered subspace;
    a modest overestimate only slightly relaxes the damping).
    Full reorthogonalization — k is small (~10) and matvecs dominate.
    """
    n = v0.shape[0]
    dtype = v0.dtype
    v = (v0 / jnp.maximum(jnp.linalg.norm(v0), 1e-30)).reshape(n)

    def body(j, state):
        V, alphas, betas, v, prev, beta = state
        V = V.at[:, j].set(v)
        w = mv(v[:, None])[:, 0] - beta * prev
        alpha = jnp.vdot(v, w)
        w = w - alpha * v
        w = w - V @ (V.T @ w)  # full reorthogonalization (j+1 live columns)
        beta_new = jnp.linalg.norm(w)
        # breakdown guard: an invariant Krylov subspace leaves w at pure
        # round-off; w/1e-30 would be a huge vector whose later inner
        # products can overflow f32 and NaN the bound — contribute benign
        # zeros instead (theta_max of the filled columns is already exact)
        broke = beta_new <= jnp.asarray(1e-7, dtype) * jnp.maximum(jnp.abs(alpha), 1.0)
        v_new = jnp.where(broke, 0.0, w / jnp.maximum(beta_new, 1e-30))
        return (V, alphas.at[j].set(alpha), betas.at[j].set(beta_new),
                v_new, v, beta_new)

    init = (
        jnp.zeros((n, k), dtype), jnp.zeros((k,), dtype), jnp.zeros((k,), dtype),
        v, jnp.zeros((n,), dtype), jnp.asarray(0.0, dtype),
    )
    V, alphas, betas, *_ = lax.fori_loop(0, k, body, init)
    T = (
        jnp.diag(alphas)
        + jnp.diag(betas[: k - 1], 1)
        + jnp.diag(betas[: k - 1], -1)
    )
    theta, S = jnp.linalg.eigh(T)
    bound = theta[-1] + betas[-1]
    ritz = V @ S[:, -1]
    return bound, ritz[:, None]


def _chefsi_bottom(mv_filt, mv_full, X, b, k: int, deg: int, rounds: int,
                   polish_deg: int, a0, mv_polish=None):
    """Bottom-k eigenpairs via Chebyshev-filtered subspace iteration with an
    ADAPTIVE window lower edge.

    ``X (n, m)`` with m >= k is the (warm-startable) subspace; ``mv_filt``
    is the cheap (possibly bf16) matvec used for the bulk filtering,
    ``mv_full`` the full-precision matvec used for the polish pass and the
    Rayleigh-Ritz extractions (the certificate eigenvalues come from there).
    ``mv_polish`` (default ``mv_full``) optionally substitutes a cheaper
    full-operand product for the polish filter only — see
    :func:`_make_operator`.
    ``b`` is a safe upper bound of the spectrum; ``a0`` the initial window
    lower edge.  Returns ``(evals ascending (k,), vectors (n, k),
    X_next (n, m), a_next)``.

    The filter suppresses [a, b] and amplifies [0, a).  A FIXED ``a``
    (e.g. 0.05 b) fails on spectra with a dense near-kernel cluster
    (lambda_4/lambda_max ~ 1e-3: real camera graphs at low measurement
    noise): everything under the edge is amplified equally and the m-dim
    subspace cannot isolate the 3 kernel vectors — the regime ARPACK's
    shift-invert handles via 1/(lambda + sigma) amplification in the
    reference (bipgo.py:288).  The standard CheFSI remedy (Zhou et al.) is
    a Rayleigh-Ritz pass after EVERY filter round, moving ``a`` to the
    first unwanted Ritz value (theta_{k+1}): the window tightens onto the
    actual bottom cluster and per-round separation of the kernel improves
    from ~O(1) to orders of magnitude.  Reduced-precision filter matvecs
    re-inject ~1e-3 relative contamination outside the target subspace; the
    ``polish_deg`` full-precision pass damps it before the final extraction.
    """

    def rayleigh_ritz(Q):
        S = jnp.matmul(Q.T, mv_full(Q), precision=HIGHEST)
        S = 0.5 * (S + S.T)
        theta, W = jnp.linalg.eigh(S)  # ascending
        return theta, jnp.matmul(Q, W, precision=HIGHEST)

    def round_body(_, carry):
        X, a = carry
        Q, _ = jnp.linalg.qr(_cheb_filter(mv_filt, X, deg, a, b))
        theta, V = rayleigh_ritz(Q)
        # next window: amplify everything at/below the wanted band, damp the
        # rest; clamped away from both window edges (a degenerate window
        # destroys the three-term recurrence scaling)
        a_next = jnp.clip(theta[k], 1e-6 * b, 0.5 * b)
        return V, a_next

    Q, a = lax.fori_loop(0, rounds, round_body, (X, a0))
    if polish_deg > 0:
        Q, _ = jnp.linalg.qr(
            _cheb_filter(mv_polish or mv_full, Q, polish_deg, a, b))
    theta, V = rayleigh_ritz(Q)
    a_next = jnp.clip(theta[k], 1e-6 * b, 0.5 * b)
    return theta[:k], V[:, :k], V, a_next


def _resolve_filter_dtype(filter_dtype: str, dtype):
    """'auto' -> bf16 filtering for f32 problems, full precision for f64
    (CPU parity runs; XLA CPU bf16 matmuls gain nothing there)."""
    if filter_dtype == "auto":
        return jnp.bfloat16 if dtype == jnp.float32 else None
    if filter_dtype == "bfloat16":
        return jnp.bfloat16
    if filter_dtype in ("none", "full"):
        return None
    raise ValueError(f"unknown filter_dtype: {filter_dtype!r}")


def _edge_blocks_fn(KR_s, k_s):
    """Per-chunk folded block accessor, decoding the int16-quaternion wire
    format (see :func:`sort_edges_by_time_wire`) when present.

    Returns ``(blocks(c) -> (cap, 3, 3), dtype)``; ``c = None`` yields the
    flat (E, 3, 3) stack.
    """
    if KR_s.ndim == 3 and KR_s.shape[-1] == 4:  # int16 quat wire
        from ..ops.lie import quat_to_mat

        dtype = k_s.dtype

        def blocks(c=None):
            q = KR_s if c is None else KR_s[c]
            k = k_s if c is None else k_s[c]
            q = q.reshape(-1, 4).astype(dtype) * (1.0 / 32767.0)
            return quat_to_mat(q) * k.reshape(-1)[:, None, None]

        return blocks, dtype

    dtype = KR_s.dtype

    def blocks(c=None):
        x = KR_s if c is None else KR_s[c]
        return x.reshape(-1, 3, 3)

    return blocks, dtype


def _make_operator(KR_s, k_s, cam_s, tloc_s, *, C, chunk_t, prec, f_dtype,
                   budget=_MATERIALIZE_BUDGET_BYTES):
    """Build the graph-operator closures shared by the single-chip and
    per-device (sharded) solvers.

    Returns ``(prepare, time_products)``:

    - ``prepare(lbd_c, lbd_t, inv_scale) -> (mv_full, mv_filt, mv_polish,
      apply_pwr)``, called once per primal-dual iteration.  ``mv_*`` are
      matvecs of the scaled Laplacian ``(blockdiag(Lambda_C) - R~) *
      inv_scale`` on (3C, w) blocks — ``mv_filt`` through the
      reduced-precision operator; ``mv_polish`` reads the FULL-precision
      operand at 3-pass (HIGH) matmul precision: the polish pass only needs
      to damp the ~2^-8 bf16 OPERAND contamination, and bf16x3 products on
      f32 operands carry ~1e-6 relative error — at the f32 target — while
      halving the MXU passes of the 6-pass HIGHEST product (measured
      19.5 ms -> ~12 ms per pass on a v5e, where HIGHEST is MXU-bound at
      14 ms and the 2x f32 B read bounds at 8.8 ms); ``apply_pwr(X)`` is
      the raw power-graph product ``R~ @ X`` at full precision (the dual
      update, bipgo.py:300).
    - ``time_products(r)``: ``rt_raw[t] = sum_i M_it^T r[i]`` (full
      precision), shape (n_chunks*chunk_t, 3, 3) (bipgo.py:318).

    When the flat (3C, 3*T_pad) operator ``B`` (plus its filter-precision
    copy) fits the HBM budget, it is scattered ONCE — loop-invariant — and
    every product is one large resident-operand MXU matmul.  Past the budget
    the closures fall back to per-chunk streaming re-scatter building the
    dense (3C, 3C) power graph once per iteration (slow but unbounded T).
    """
    edge_blocks, dtype = _edge_blocks_fn(KR_s, k_s)
    n_chunks, cap = cam_s.shape
    three_c = 3 * C
    three_t = 3 * chunk_t
    T_pad = n_chunks * chunk_t
    a3 = jnp.arange(3, dtype=jnp.int32)

    bytes_full = three_c * 3 * T_pad * jnp.dtype(dtype).itemsize
    bytes_filt = (three_c * 3 * T_pad * 2) if f_dtype is not None else 0
    if bytes_full + bytes_filt <= budget:
        # ---- flat materialized operator -------------------------------
        chunk_base = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk_t)[:, None]
        gtime = (chunk_base + tloc_s).reshape(-1)  # (E,) global padded time
        rows = 3 * cam_s.reshape(-1)[:, None, None] + a3[None, :, None]
        cols = 3 * gtime[:, None, None] + a3[None, None, :]
        B = jnp.zeros((three_c, 3 * T_pad), dtype).at[rows, cols].add(
            edge_blocks()
        )
        from .pallas_pwr import (
            lam_panels, pallas_pwr_enabled, panels_from_flat, pwr_apply,
        )

        use_pallas = f_dtype == jnp.bfloat16 and pallas_pwr_enabled()
        if use_pallas:
            # single-read fused filter kernel (pallas_pwr.py): the operator
            # is stored as stacked (3*PANEL, 3C) panels instead of a flat
            # bf16 copy — same bytes, read ONCE per filter application
            # (the XLA two-GEMM path reads it twice; measured 9.1 -> ~3 ms
            # per pass on a v5e at 10k cams)
            B_pan = panels_from_flat(B, T_pad)
            B_filt = None
        else:
            B_filt = B.astype(f_dtype) if f_dtype is not None else B

        def _mv(M, X, precision):
            """M @ X with full-precision accumulation regardless of M's
            storage dtype."""
            return jnp.matmul(
                M, X.astype(M.dtype), precision=precision,
                preferred_element_type=dtype,
            )

        def _apply_pwr(X, lbd_t, filt, polish=False):
            Bx = B_filt if (filt and B_filt is not None) else B
            # bf16 operands take the native single-pass MXU path; full-
            # precision operands honor the requested f32 precision (the
            # polish variant reads f32 at 3-pass HIGH — see the module
            # docstring of prepare above)
            if filt and f_dtype is not None:
                precision = None
            elif polish:
                precision = lax.Precision.HIGH
            else:
                precision = prec
            w = X.shape[1]
            Z = _mv(Bx.T, X, precision)  # (3*T_pad, w)
            # blockwise Lambda application: a dense (3T, 3T) block-diagonal
            # matmul would spend ~T x its flops on structural zeros
            Z = jnp.einsum(
                "tab,tbw->taw", lbd_t, Z.reshape(T_pad, 3, w), precision=HIGHEST
            ).reshape(3 * T_pad, w)
            return _mv(Bx, Z, precision)

        def prepare(lbd_c, lbd_t, inv_scale):
            def mv_full(X):
                return (
                    _blockdiag_mv(lbd_c, X) - _apply_pwr(X, lbd_t, False)
                ) * inv_scale

            if use_pallas:
                lamp = lam_panels(lbd_t, B_pan.shape[0])

                def mv_filt(X):
                    # kernel works on transposed (w, n) operands — (n, w)
                    # lane-pads w to 128 in VMEM (15 MB at n=30k)
                    pwr = pwr_apply(
                        lamp, jnp.transpose(X).astype(f_dtype), B_pan
                    ).T
                    return (_blockdiag_mv(lbd_c, X) - pwr) * inv_scale
            else:

                def mv_filt(X):
                    return (
                        _blockdiag_mv(lbd_c, X) - _apply_pwr(X, lbd_t, True)
                    ) * inv_scale

            def mv_polish(X):
                return (
                    _blockdiag_mv(lbd_c, X) - _apply_pwr(X, lbd_t, False, True)
                ) * inv_scale

            apply_pwr = lambda X: _apply_pwr(X, lbd_t, False)
            return mv_full, mv_filt, mv_polish, apply_pwr

        def time_products(r):
            rt = jnp.matmul(B.T, r.reshape(three_c, 3), precision=prec)
            return rt.reshape(T_pad, 3, 3)

        return prepare, time_products

    # ---- streaming fallback (>HBM): dense power graph per iteration ----
    def chunk_block(c):
        rows = 3 * cam_s[c][:, None, None] + a3[None, :, None]
        cols = 3 * tloc_s[c][:, None, None] + a3[None, None, :]
        return jnp.zeros((three_c, three_t), dtype).at[rows, cols].add(
            edge_blocks(c)
        )

    def prepare(lbd_c, lbd_t, inv_scale):
        def acc_body(c, acc):
            Bc = chunk_block(c)
            lc = lax.dynamic_slice(lbd_t, (c * chunk_t, 0, 0), (chunk_t, 3, 3))
            Y = jnp.einsum(
                "atb,tbd->atd", Bc.reshape(three_c, chunk_t, 3), lc,
                precision=HIGHEST,
            ).reshape(three_c, three_t)
            return acc + jnp.matmul(Y, Bc.T, precision=prec)

        pwr = lax.fori_loop(
            0, n_chunks, acc_body, jnp.zeros((three_c, three_c), dtype)
        )
        cc = jnp.arange(C, dtype=jnp.int32)
        rows = 3 * cc[:, None, None] + a3[None, :, None]
        cols = 3 * cc[:, None, None] + a3[None, None, :]
        L = (-pwr).at[rows, cols].add(lbd_c)
        Ls = (0.5 * inv_scale) * (L + L.T)
        Lb = Ls.astype(f_dtype) if f_dtype is not None else Ls

        mv_full = lambda X: jnp.matmul(Ls, X, precision=prec)
        if f_dtype is not None:
            mv_filt = lambda X: jnp.matmul(
                Lb, X.astype(f_dtype), preferred_element_type=dtype
            )
        else:
            mv_filt = mv_full
        apply_pwr = lambda X: jnp.matmul(pwr, X, precision=prec)
        # streaming regime: the per-iteration dense power-graph build
        # dominates, a cheaper polish product buys nothing
        return mv_full, mv_filt, mv_full, apply_pwr

    def time_products(r):
        r_flat = r.reshape(three_c, 3)

        def body(c, acc):
            rt = jnp.matmul(chunk_block(c).T, r_flat, precision=prec)
            return lax.dynamic_update_slice(
                acc, rt.reshape(chunk_t, 3, 3), (c * chunk_t, 0, 0)
            )

        return lax.fori_loop(
            0, n_chunks, body, jnp.zeros((T_pad, 3, 3), dtype)
        )

    return prepare, time_products


def _blockdiag_mv(blocks, X):
    """(n/3, 3, 3) block-diagonal @ (n, w)."""
    n, w = X.shape
    return jnp.einsum(
        "cab,cbw->caw", blocks, X.reshape(-1, 3, w), precision=HIGHEST
    ).reshape(n, w)


def _sync_body_fns(prepare, time_products, *, C, maxiter, cert_tol,
                   cheb_degree, cheb_rounds, cheb_degree_warm, polish_deg,
                   have_filt, dtype):
    """The primal-dual while_loop (cond, body, init) shared by the
    single-chip and sharded solvers, parameterized by the operator closures
    from :func:`_make_operator`.

    Mathematically identical to :func:`vican_tpu.solver.core.so3_sync` (same
    init, update order and certificate — bipgo.py:145-350); tested for parity
    in tests/test_scale.py.
    """
    n = 3 * C
    eye3 = jnp.eye(3, dtype=dtype)

    def cond(state):
        it, max_eval = state[0], state[1]
        return (it < maxiter) & (max_eval > cert_tol)

    def body(state):
        (it, _, lbd_c, lbd_t, _, _, _, _, X, vmax, lmax_raw_prev, a_raw_prev,
         ev_hist, gap_hist) = state

        # Normalize by the largest Lambda_C diagonal entry (>= max |diag L|,
        # since the power-graph diagonal is PSD) for f32-stable filtering;
        # eigenvalues are rescaled back for the certificate.
        scale = jnp.maximum(jnp.max(jnp.abs(lbd_c[:, (0, 1, 2), (0, 1, 2)])), 1e-30)
        inv_scale = 1.0 / scale
        mv_full, mv_filt, mv_polish, apply_pwr = prepare(lbd_c, lbd_t, inv_scale)

        # lambda_max of the scaled operator: a safeguarded Lanczos upper
        # bound on the first iteration (robust to near-degenerate top
        # clusters where plain power iteration underestimates), then cheap
        # warm-started power refinement (the Laplacian moves only
        # O(dual update) per iteration)
        lmax, vmax = lax.cond(
            it == 0,
            lambda v: _lmax_lanczos(mv_filt, v, 12),
            lambda v: _lmax_refine(mv_filt, v, 4),
            vmax,
        )
        # Window guard: on warm iterations the 4-step refinement can lag a
        # dual update that moved the top of the spectrum; a Chebyshev window
        # that undershoots lambda_max AMPLIFIES the above-b components and
        # degrades the subspace.  The operator moves O(dual update) per
        # iteration, so the previous iteration's (unscaled) estimate is a
        # valid lower bound — never let the window shrink below it.
        lmax = jnp.maximum(lmax, lmax_raw_prev * inv_scale)
        lmax_raw = lmax * scale
        b = lmax * 1.15  # margin over the estimate

        # window lower edge: warm-carried from the previous iteration's
        # Rayleigh-Ritz (first unwanted Ritz value), 0.05*b on iteration 0
        a0 = jnp.where(a_raw_prev > 0, a_raw_prev * inv_scale, 0.05 * b)
        a0 = jnp.clip(a0, 1e-6 * b, 0.5 * b)
        pol = polish_deg if have_filt else 0
        evals5, V5, X_next, a_next = lax.cond(
            it == 0,
            lambda X: _chefsi_bottom(
                mv_filt, mv_full, X, b, 5, cheb_degree, cheb_rounds, pol, a0,
                mv_polish=mv_polish,
            ),
            lambda X: _chefsi_bottom(
                mv_filt, mv_full, X, b, 5, cheb_degree_warm, 1, pol, a0,
                mv_polish=mv_polish,
            ),
            X,
        )
        a_raw = a_next * scale
        evals5 = evals5 * scale
        eigengap = jnp.abs(evals5[3] / evals5[2])
        max_eval = jnp.max(jnp.abs(evals5))

        # Primal rounding (bipgo.py:295-297)
        V3 = V5[:, :3]
        r = jnp.matmul(V3, jnp.linalg.inv(V3[:3, :3]), precision=HIGHEST)
        r_blocks = project_so3(r.reshape(C, 3, 3))

        # Camera dual update (bipgo.py:300-315): SVD of (R~ r) blocks,
        # matrix-free width-3 product.
        rtr = apply_pwr(r_blocks.reshape(n, 3)).reshape(C, 3, 3)
        r_c, u, s, _ = svd3_so3(rtr)
        lbd_c_new = jnp.einsum("cab,cb,cdb->cad", u, s, u, precision=HIGHEST)

        # Time dual update (bipgo.py:317-332)
        rt_raw = time_products(r_c)
        r_t, ut, st, _ = svd3_so3(rt_raw)
        # pseudo-inverse guard: a (near-)rank-deficient time block would put
        # ~1e30 into Lambda_T and blow up the next power graph; zeroing the
        # tiny directions is the stable generalization of bipgo.py:329.
        st_inv = jnp.where(st > 1e-9 * st[..., :1], 1.0 / jnp.maximum(st, 1e-30), 0.0)
        lbd_t_new = jnp.einsum("tab,tb,tdb->tad", ut, st_inv, ut, precision=HIGHEST)

        slot = jnp.minimum(it, HIST_CAP - 1)
        return (
            it + 1, max_eval, lbd_c_new, lbd_t_new, r_c, r_t, evals5,
            eigengap, X_next, vmax, lmax_raw, a_raw,
            ev_hist.at[slot].set(evals5), gap_hist.at[slot].set(eigengap),
        )

    return cond, body


def _subspace_init(n, m, dtype):
    """Deterministic orthonormal start (warm-started across iterations)."""
    ii = jnp.arange(n, dtype=dtype)[:, None]
    jj = jnp.arange(m, dtype=dtype)[None, :]
    X0 = jnp.cos(ii * (jj + 1.0) * 0.37 + jj)
    X0, _ = jnp.linalg.qr(X0)
    v0 = jnp.cos(jnp.arange(n, dtype=dtype))[:, None]
    v0 = v0 / jnp.linalg.norm(v0)
    return X0, v0


@partial(jax.jit, static_argnames=(
    "C", "T", "chunk_t", "cheb_degree", "cheb_rounds", "cheb_degree_warm",
    "subspace", "precision", "filter_dtype", "polish_deg", "materialize_budget",
))
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
    cheb_degree_warm: int = 28,
    subspace: int = 10,
    precision: str = "highest",
    filter_dtype: str = "auto",
    polish_deg: int = 6,
    materialize_budget: int = _MATERIALIZE_BUDGET_BYTES,
) -> SyncResult:
    """Primal-dual SO(3) sync without the dense (C, 3, T, 3) block tensor
    and without ever materializing the (3C, 3C) power graph.

    Inputs are the chunked edge arrays from :func:`sort_edges_by_time`.

    The first iteration runs the full Chebyshev budget (``cheb_degree`` x
    ``cheb_rounds``); subsequent iterations start from the warm subspace —
    the power graph moves only O(dual-update) per iteration — and need a
    single light filter pass (``cheb_degree_warm``).

    ``precision``: matmul precision of the full-precision contractions
    (accepted for API stability; the dominant filter matvecs are governed by
    ``filter_dtype`` instead).  ``filter_dtype="auto"`` filters through a
    bfloat16 copy of the chunk blocks for f32 problems (halves the
    bandwidth of the dominant loop; the ``polish_deg`` full-precision pass +
    full-precision Rayleigh-Ritz keep the extracted eigenpairs at f32
    quality — measured ~1e-5 rad perturbation, far below the 1e-3 parity
    budget) and full precision for f64.
    """
    prec = {
        "highest": HIGHEST,
        "high": lax.Precision.HIGH,
        "default": lax.Precision.DEFAULT,
    }[precision]
    dtype = k_s.dtype if (KR_s.ndim == 3 and KR_s.shape[-1] == 4) else KR_s.dtype
    f_dtype = _resolve_filter_dtype(filter_dtype, dtype)
    n_chunks = k_s.shape[0]
    n = 3 * C

    deg_t = jnp.zeros((n_chunks, chunk_t), dtype)
    deg_t = jax.vmap(lambda d, t, k: d.at[t].add(k))(deg_t, tloc_s, k_s)
    deg_c = jnp.zeros((C,), dtype).at[cam_s.reshape(-1)].add(k_s.reshape(-1))

    prepare, time_products = _make_operator(
        KR_s, k_s, cam_s, tloc_s, C=C, chunk_t=chunk_t, prec=prec,
        f_dtype=f_dtype, budget=materialize_budget,
    )

    eye3 = jnp.eye(3, dtype=dtype)
    lbd_t0 = eye3 / jnp.maximum(deg_t.reshape(-1), 1e-30)[:, None, None]
    lbd_c0 = deg_c[:, None, None] * eye3

    cond, body = _sync_body_fns(
        prepare, time_products, C=C, maxiter=maxiter, cert_tol=cert_tol,
        cheb_degree=cheb_degree, cheb_rounds=cheb_rounds,
        cheb_degree_warm=cheb_degree_warm, polish_deg=polish_deg,
        have_filt=f_dtype is not None, dtype=dtype,
    )

    X0, v0 = _subspace_init(n, subspace, dtype)
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
        v0,
        jnp.zeros((), dtype),
        jnp.zeros((), dtype),
        jnp.zeros((HIST_CAP, 5), dtype),
        jnp.zeros((HIST_CAP,), dtype),
    )
    out = lax.while_loop(cond, body, init)
    it, _, _, _, r_c, r_t, evals5, eigengap = out[:8]

    return SyncResult(
        r_cam=jnp.swapaxes(r_c, -1, -2),
        r_time=jnp.swapaxes(r_t[:T], -1, -2),
        evals=evals5,
        eigengap=eigengap,
        num_iters=it,
        evals_hist=out[12],
        gap_hist=out[13],
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
    cheb_degree_warm: int = 28,
    subspace: int = 10,
    precision: str = "highest",
    filter_dtype: str = "auto",
    polish_deg: int = 6,
    materialize_budget: int = _MATERIALIZE_BUDGET_BYTES,
) -> SyncResult:
    """Multi-chip large-graph SO(3) sync: the chunk stream sharded over the
    mesh's first axis.

    Each device loops over its local time chunks, accumulating the partial
    (3C, width) matvec of every graph product; ``psum`` over ICI combines
    the partials (the collective payload is a thin matrix — the eigensolver
    subspace or a width-3 block — NOT the (3C, 3C) power graph, which is
    never formed).  The camera-block state (eigensolve, duals) is
    replicated — it is tiny by the power-graph construction.  Time-node
    state (Lambda_T, r_t, per-time SVDs) stays sharded with its chunks.
    This is SURVEY.md §5's "sequence parallelism" made concrete.
    """
    from jax.sharding import PartitionSpec as P

    prec = {
        "highest": HIGHEST,
        "high": lax.Precision.HIGH,
        "default": lax.Precision.DEFAULT,
    }[precision]
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n_chunks = KR_s.shape[0]
    pad_chunks = (-n_chunks) % n_dev
    if pad_chunks:
        padz = lambda a: np.concatenate(
            [np.asarray(a), np.zeros((pad_chunks,) + a.shape[1:], np.asarray(a).dtype)]
        )
        KR_s, k_s, cam_s, tloc_s = map(padz, (KR_s, k_s, cam_s, tloc_s))
        n_chunks += pad_chunks
    KR_s = np.asarray(KR_s)
    wire = KR_s.ndim == 3 and KR_s.shape[-1] == 4
    if wire and pad_chunks:
        # padded chunks must carry identity quats (zero quats NaN through
        # the normalization in quat_to_mat); their weights stay zero
        KR_s[-pad_chunks:, :, 0] = 32767
    dtype = np.asarray(k_s).dtype if wire else KR_s.dtype
    f_dtype = _resolve_filter_dtype(filter_dtype, dtype)
    n = 3 * C

    def body_fn(KR_l, k_l, cam_l, tloc_l):
        """Per-device: local chunks (nc_local, cap, ...)."""
        nc_local = k_l.shape[0]
        eye3 = jnp.eye(3, dtype=dtype)

        deg_t_l = jax.vmap(lambda t, k: jnp.zeros((chunk_t,), dtype).at[t].add(k))(
            tloc_l, k_l
        )
        deg_c = jax.lax.psum(
            jnp.zeros((C,), dtype).at[cam_l.reshape(-1)].add(k_l.reshape(-1)), axis
        )

        local_prepare, local_tp = _make_operator(
            KR_l, k_l, cam_l, tloc_l, C=C, chunk_t=chunk_t, prec=prec,
            f_dtype=f_dtype, budget=materialize_budget,
        )

        def prepare(lbd_c, lbd_t_l, inv_scale):
            """psum-combine the per-device partial matvecs.

            Each local closure computes its column block's contribution; the
            Lambda_C block-diagonal term is replicated, so it must enter
            AFTER the psum — local closures get lbd_c = 0 and the full-term
            wrappers add it once.
            """
            zero_c = jnp.zeros_like(lbd_c)
            l_full, l_filt, l_polish, l_pwr = local_prepare(
                zero_c, lbd_t_l, inv_scale)

            def mv_full(X):
                return jax.lax.psum(l_full(X), axis) + (
                    _blockdiag_mv(lbd_c, X) * inv_scale
                )

            def mv_filt(X):
                return jax.lax.psum(l_filt(X), axis) + (
                    _blockdiag_mv(lbd_c, X) * inv_scale
                )

            def mv_polish(X):
                return jax.lax.psum(l_polish(X), axis) + (
                    _blockdiag_mv(lbd_c, X) * inv_scale
                )

            def apply_pwr(X):
                return jax.lax.psum(l_pwr(X), axis)

            return mv_full, mv_filt, mv_polish, apply_pwr

        cond, body = _sync_body_fns(
            prepare, local_tp, C=C, maxiter=maxiter, cert_tol=cert_tol,
            cheb_degree=cheb_degree, cheb_rounds=cheb_rounds,
            cheb_degree_warm=cheb_degree_warm, polish_deg=polish_deg,
            have_filt=f_dtype is not None, dtype=dtype,
        )

        lbd_t0 = eye3 / jnp.maximum(deg_t_l.reshape(-1), 1e-30)[:, None, None]
        lbd_c0 = deg_c[:, None, None] * eye3
        X0, v0 = _subspace_init(n, subspace, dtype)
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
            v0,
            jnp.zeros((), dtype),
            jnp.zeros((), dtype),
            jnp.zeros((HIST_CAP, 5), dtype),
            jnp.zeros((HIST_CAP,), dtype),
        )
        out = lax.while_loop(cond, body, init)
        it, _, _, _, r_c, r_t_l, evals5, eigengap = out[:8]
        return (
            jnp.swapaxes(r_c, -1, -2),
            jnp.swapaxes(r_t_l, -1, -2),
            evals5,
            eigengap,
            it,
            out[12],
            out[13],
        )

    sharded = jax.shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis), P(), P(), P(), P(), P()),
        check_vma=False,
    )

    def to_global(x):
        """Chunk-axis-sharded global array; works for single- AND
        multi-process meshes (each process serves its addressable shards
        from the full host copy — all processes hold identical data)."""
        from jax.sharding import NamedSharding

        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(axis))
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    with jax.default_matmul_precision("highest"):
        r_cam, r_time, evals5, eigengap, it, ev_hist, gap_hist = jax.jit(sharded)(
            to_global(KR_s), to_global(k_s), to_global(cam_s), to_global(tloc_s)
        )
    return SyncResult(
        r_cam=r_cam, r_time=r_time[:T], evals=evals5, eigengap=eigengap, num_iters=it,
        evals_hist=ev_hist, gap_hist=gap_hist,
    )

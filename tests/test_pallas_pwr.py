"""Single-read Pallas power-graph kernel (solver/pallas_pwr.py).

Runs the Pallas interpreter on CPU: the same jaxpr the Mosaic kernel
executes on TPU, minus the DMA scheduling.  The TPU-side compile +
bit-parity of the real kernel is exercised by benchmarks/roofline.py and
the scale bench; here we pin (a) the kernel math against the XLA filter
path it replaces (scale.py:397-416) and (b) the integrated
``so3_sync_large`` solve with the kernel forced on vs off.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vican_tpu.ops.lie import distance_so3
from vican_tpu.solver import core, pack_problem
from vican_tpu.solver.pallas_pwr import (
    PANEL, lam_panels, panels_from_flat, pwr_apply,
)
from vican_tpu.solver.scale import so3_sync_large, sort_edges_by_time
from vican_tpu.synthetic import make_problem_arrays


def _xla_ref(B, lbd, X):
    """The XLA two-GEMM bf16 filter contract the kernel replaces."""
    T = lbd.shape[0]
    w = X.shape[1]
    Bb = B.astype(jnp.bfloat16)
    Z = jnp.matmul(
        Bb.T, X.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    Z = jnp.einsum(
        "tab,tbw->taw", lbd, Z.reshape(T, 3, w),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(3 * T, w)
    return jnp.matmul(
        Bb, Z.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )


@pytest.mark.parametrize(
    "n,T,w",
    [
        (48, 70, 5),    # T not a panel multiple (zero-padded tail rows)
        (64, 64, 1),    # w=1: the lmax power/Lanczos probes
        (48, 33, 10),   # production block width
        (128, PANEL, 7),  # exactly one panel
    ],
)
def test_kernel_matches_xla_filter_path(n, T, w):
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((n, 3 * T)), jnp.float32)
    lbd = jnp.asarray(rng.standard_normal((T, 3, 3)), jnp.float32)
    X = jnp.asarray(rng.standard_normal((n, w)), jnp.float32)

    ref = np.asarray(_xla_ref(B, lbd, X))
    bpan = panels_from_flat(B, T)
    lamp = lam_panels(lbd, bpan.shape[0])
    n_pad = -(-n // 128) * 128  # camera axis 128-padded for Mosaic slices
    assert bpan.shape == (-(-T // PANEL), 3 * PANEL, n_pad)
    out = np.asarray(
        pwr_apply(lamp, jnp.transpose(X).astype(jnp.bfloat16), bpan)
    ).T

    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-30)
    # identical math modulo f32 accumulation order (panel-chunked vs one
    # GEMM); bf16 operand rounding is shared by both sides
    assert err < 1e-5, err


def test_panel_layout_roundtrip():
    """Bpan[j, a*P + r, :] == B[:, 3*(j*P + r) + a] (the layout contract
    the kernel's Lambda-closure argument rests on)."""
    rng = np.random.default_rng(1)
    n, T = 24, 40
    B = jnp.asarray(rng.standard_normal((n, 3 * T)), jnp.float32)
    bpan = np.asarray(panels_from_flat(B, T))
    Bn = np.asarray(B.astype(jnp.bfloat16), np.float32)
    for j, r, a in [(0, 0, 0), (0, 5, 2), (1, T - PANEL - 1, 1)]:
        t = j * PANEL + r
        np.testing.assert_array_equal(
            bpan[j, a * PANEL + r, :n].astype(np.float32), Bn[:, 3 * t + a]
        )
    # zero-padded tail rows: t >= T in every plane of the last panel
    r0 = T % PANEL  # first padded local row (T=40, PANEL=32 -> 8)
    assert r0 > 0
    for a in range(3):
        tail = bpan[-1, a * PANEL + r0 : (a + 1) * PANEL]
        np.testing.assert_array_equal(tail, 0.0)


def test_integrated_solve_matches_xla_path(monkeypatch):
    """so3_sync_large with the kernel forced on (interpret mode on CPU)
    against the stock XLA filter path — same bf16 filter schedule, so the
    solves should agree to rounding-order noise."""
    prob = make_problem_arrays(
        seed=7, n_cams=24, n_times=96, n_markers=6, n_edges=2500,
        kappa_r=1e5, sigma_t=1e-4,
    )
    p = pack_problem(
        prob.edges, prob.constraints(), lambda e: 1.0, lambda e: 1.0,
        lambda e: True, dtype=np.float32,
    )
    C, T = p.num_cams, p.num_times
    KR = core.fold_constraints(
        jnp.asarray(p.R_e), jnp.asarray(p.k_r), jnp.asarray(p.marker_idx),
        jnp.asarray(p.R_con), p.root_idx,
    )
    chunked = [
        jnp.asarray(x)
        for x in sort_edges_by_time(
            np.asarray(KR), p.k_r, p.cam_idx, p.time_idx, T, 32
        )
    ]

    def solve():
        return so3_sync_large(
            *chunked, C=C, T=T, chunk_t=32,
            maxiter=jnp.asarray(4, jnp.int32), filter_dtype="bfloat16",
        )

    monkeypatch.setenv("VICAN_TPU_SCALE_PALLAS", "0")
    off = solve()
    monkeypatch.setenv("VICAN_TPU_SCALE_PALLAS", "1")
    on = solve()

    d_cam = np.asarray(distance_so3(off.r_cam, on.r_cam)).max()
    d_time = np.asarray(distance_so3(off.r_time, on.r_time)).max()
    # both runs filter in bf16 with f32 accumulation; the only divergence
    # is panel-chunked vs single-GEMM accumulation order, which this noisy
    # fixture amplifies through QR exactly like any two variants in
    # test_large_path_matches_core (its bar: 0.2 deg; measured here 0.06)
    assert d_cam < 0.15, d_cam  # degrees
    assert d_time < 0.15, d_time

    # and the kernel run loses nothing against ground truth: gauge-aligned
    # GT rotation error within 0.01 deg of the XLA path's
    from vican_tpu.ops.lie import gauge_procrustes_so3

    def gt_err(r_cam):
        gt = np.stack(
            [np.asarray(prob.cams_gt[c].R(), np.float64) for c in p.cam_ids]
        )
        est = np.swapaxes(np.asarray(r_cam, np.float64), -1, -2)
        gt_T = np.swapaxes(gt, -1, -2)
        G = np.asarray(gauge_procrustes_so3(gt_T, est))
        return np.asarray(distance_so3(est @ G, gt_T)).mean()

    assert abs(gt_err(on.r_cam) - gt_err(off.r_cam)) < 0.01

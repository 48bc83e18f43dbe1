"""Generate the persisted se3sync golden fixture (tests/fixtures/golden_se3sync.npz).

Run ONCE with the reference checkout present (``python
tests/fixtures/gen_golden_se3sync.py``); the resulting .npz is committed so
``tests/test_golden.py`` can assert parity with the reference solver even in
environments where /root/reference is absent (VERDICT r3 item 5: the
published ``cam_marker_edges.pt`` datasets are unavailable here, so this
fixture stands in for them as the drift guard).

Contents: a mid-size converged camera-network problem (measurements stored
as float32 — both solvers consume the exact same values) plus the reference
``bipartite_se3sync`` float64 output poses (vican/bipgo.py:353-490) for
every node, in a fixed key order (cameras ``0..C-1`` then time nodes
``"<t>_0"``).
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

# Converged fixture (cf. tests/test_solver.py test_se3sync_f32_wire_parity):
# high kappa + dense-enough observations so the maxiter=4 iterate is
# converged and f32-route rounding stays far below the parity budget.
CONFIG = dict(seed=42, n_cams=16, n_times=250, n_markers=6, p_obs=0.4,
              kappa_r=1e7, sigma_t=1e-5)
MAXITER = 4


def edges_from_arrays(ci, ti, mi, R, t, err, se3_cls):
    out = {}
    zero_corners = np.zeros((4, 2))
    for e in range(len(ci)):
        out[(str(ci[e]), f"{ti[e]}_{mi[e]}")] = {
            "pose": se3_cls(R=np.asarray(R[e], np.float64), t=np.asarray(t[e], np.float64)),
            "corners": zero_corners,
            "reprojected_err": float(err[e]),
            "im_filename": f"{ti[e]}/{ci[e]}.jpg",
        }
    return out


NOISE_R = lambda e: 1.0 + 10.0 * e["reprojected_err"]
NOISE_T = lambda e: 0.5 + 10.0 * e["reprojected_err"]
FILT = lambda e: e["reprojected_err"] < 0.035


def main():
    from vican.bipgo import bipartite_se3sync as ref_se3sync
    from vican.geometry import SE3 as RefSE3

    from vican_tpu.synthetic import make_problem

    prob = make_problem(**CONFIG)

    # flatten the edge dict into storable arrays, f32 (the shared wire truth)
    keys = sorted(prob.edges.keys(), key=lambda k: (int(k[0]), *map(int, k[1].split("_"))))
    ci = np.array([int(c) for c, _ in keys], np.int32)
    ti = np.array([int(tm.split("_")[0]) for _, tm in keys], np.int32)
    mi = np.array([int(tm.split("_")[1]) for _, tm in keys], np.int32)
    R = np.stack([prob.edges[k]["pose"].R() for k in keys]).astype(np.float32)
    t = np.stack([prob.edges[k]["pose"].t() for k in keys]).astype(np.float32)
    err = np.array([prob.edges[k]["reprojected_err"] for k in keys], np.float32)

    M = CONFIG["n_markers"]
    R_con = np.stack([prob.markers_gt[str(m)].R() for m in range(M)]).astype(np.float64)
    t_con = np.stack([prob.markers_gt[str(m)].t() for m in range(M)]).astype(np.float64)

    ref_edges = edges_from_arrays(ci, ti, mi, R, t, err, RefSE3)
    ref_con = {str(m): RefSE3(R=R_con[m], t=t_con[m]) for m in range(M)}
    C, T = CONFIG["n_cams"], CONFIG["n_times"]
    node_keys = [str(c) for c in range(C)] + [f"{tt}_0" for tt in range(T)]
    goldens = {}
    # one golden per dtype route: our f64 route is compared against the
    # reference's f64 run and our f32 (wire) route against the reference's
    # own f32 run — the same apples-to-apples convention as
    # tests/test_solver.py (dtype effects are real solver behavior, not
    # implementation drift, and must not be charged against the budget)
    for dtype, tag in ((np.float64, "64"), (np.float32, "32")):
        golden = ref_se3sync(
            ref_edges, constraints=ref_con, noise_model_r=NOISE_R,
            noise_model_t=NOISE_T, edge_filter=FILT, maxiter=MAXITER,
            lsqr_solver="conjugate_gradient", dtype=dtype,
        )
        assert set(golden.keys()) == set(node_keys), "unexpected reference node set"
        goldens["R_gold" + tag] = np.stack(
            [np.asarray(golden[k].R(), np.float64) for k in node_keys])
        goldens["t_gold" + tag] = np.stack(
            [np.asarray(golden[k].t(), np.float64) for k in node_keys])

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden_se3sync.npz")
    np.savez_compressed(
        out, ci=ci, ti=ti, mi=mi, R=R, t=t, err=err,
        R_con=R_con, t_con=t_con, n_cams=C, n_times=T, n_markers=M,
        maxiter=MAXITER, **goldens,
    )
    print(f"wrote {out}: {len(ci)} edges, {os.path.getsize(out) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()

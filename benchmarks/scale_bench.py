"""Scale benchmark: 10k-camera / 1M-edge SO(3) sync (BASELINE.md row 7).

The reference cannot run this configuration at all (its shift-invert LU
factors an effectively dense 30k x 30k power graph — vican/bipgo.py:288);
this measures our chunked large-graph path (solver/scale.py) on the real
device.

Measurement rules (CLAUDE.md): under jax 0.9 ``block_until_ready`` waits for
device compute but NOT D2H, so every timing forces a fetch with
``np.asarray``.  Warm numbers are a median over ``--reps`` runs after one
compile run.

Writes ``benchmarks/scale_result.json`` (read by bench.py as a recorded
detail) and prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

from vican_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(REPO)


def make_folded_edges(seed, C, T, E, kappa):
    """Synthetic folded edge blocks KR = k * R_c^T R_t with Langevin noise.

    Built directly at the folded level (the dict/packing boundary is
    measured by bench.py; this isolates the device solver at a scale where
    a 1M-entry Python dict would dominate setup time, not solve time).
    """
    from vican_tpu.solver.packing import _quat_to_mat

    rng = np.random.default_rng(seed)

    def rand_rots(n):
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        return _quat_to_mat(q)

    R_c = rand_rots(C)
    R_t = rand_rots(T)
    # coverage: every camera appears in the first C edges, every timestep in
    # the last T; the remaining assignments are uniform (E >> C + T makes the
    # bipartite graph connected with overwhelming probability)
    assert E >= C + T
    cam_idx = np.concatenate([np.arange(C), rng.integers(0, C, E - C)]).astype(np.int32)
    time_idx = np.concatenate([rng.integers(0, T, E - T), np.arange(T)]).astype(np.int32)
    # small-angle Langevin-ish noise
    ax = rng.normal(size=(E, 3)) / np.sqrt(kappa)
    th = np.linalg.norm(ax, axis=1, keepdims=True)
    k_hat = ax / np.maximum(th, 1e-12)
    K = np.zeros((E, 3, 3))
    K[:, 0, 1], K[:, 0, 2] = -k_hat[:, 2], k_hat[:, 1]
    K[:, 1, 0], K[:, 1, 2] = k_hat[:, 2], -k_hat[:, 0]
    K[:, 2, 0], K[:, 2, 1] = -k_hat[:, 1], k_hat[:, 0]
    s = np.sin(th)[..., None]
    c = (1 - np.cos(th))[..., None]
    N = np.eye(3) + s * K + c * (K @ K)
    # measurement M_ct ~ R_c^T R_t (the folded convention core.so3_sync syncs)
    KR = np.einsum("eji,ejk,ekl->eil", R_c[cam_idx], N, R_t[time_idx]).astype(np.float32)
    k_r = np.ones(E, np.float32)
    return KR, k_r, cam_idx, time_idx, R_c


def gt_rotation_error_deg(r_cam_est, R_c_gt):
    """Gauge-aligned per-camera rotation error (degrees) vs the generator's
    ground truth — the accuracy half of any speed/precision trade-off."""
    from vican_tpu.ops.lie import gauge_procrustes_so3, distance_so3

    # The sync gauge is a LEFT global rotation (r_cam ~ G R_c); align the
    # inverted stacks (the cell-9 protocol does the same via pose.inv()).
    est_T = np.asarray(r_cam_est, np.float64).transpose(0, 2, 1)
    gt_T = np.asarray(R_c_gt, np.float64).transpose(0, 2, 1)
    G = np.asarray(gauge_procrustes_so3(gt_T, est_T))  # gt_T ~ est_T @ G
    aligned = np.einsum("cij,jk->cik", est_T, G)
    d = np.asarray(distance_so3(aligned, gt_T))
    return float(d.mean()), float(d.max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=10_000)
    ap.add_argument("--times", type=int, default=10_000)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--chunk-t", type=int, default=0, help="0 = auto (~T/8)")
    ap.add_argument("--precision", default="highest", choices=["highest", "high", "default"])
    ap.add_argument("--filter-dtype", default="auto", choices=["auto", "bfloat16", "none"])
    ap.add_argument("--polish-deg", type=int, default=6)
    ap.add_argument("--cheb-degree-warm", type=int, default=28)
    ap.add_argument("--maxiter", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-wire", action="store_true",
                    help="ship (E,3,3) f32 blocks instead of int16 quats")
    ap.add_argument("--no-save", action="store_true", help="print only, don't overwrite scale_result.json")
    ap.add_argument("--midsize-oracle", action="store_true",
                    help="ALSO run the dense-eigh core path (feasible at this "
                         "size) and report the cross-path rotation delta — "
                         "the mid-size accuracy oracle of VERDICT r2 item 5; "
                         "use with --cams ~2048")
    args = ap.parse_args()

    import jax.numpy as jnp

    from vican_tpu.solver.scale import (
        so3_sync_large, sort_edges_by_time, sort_edges_by_time_wire,
    )

    C, T, E = args.cams, args.times, args.edges
    if not args.chunk_t:
        args.chunk_t = min(T, max(64, -(-T // 8)))
    t0 = time.perf_counter()
    KR, k_r, cam_idx, time_idx, R_c_gt = make_folded_edges(0, C, T, E, kappa=1e4)
    gen_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    if args.no_wire:
        chunked = sort_edges_by_time(KR, k_r, cam_idx, time_idx, T, args.chunk_t)
    else:
        # the production dict-API route ships int16 quats (k_r = 1 here, so
        # the folded blocks ARE the rotations)
        chunked = sort_edges_by_time_wire(KR, k_r, cam_idx, time_idx, T, args.chunk_t)
    chunk_s = time.perf_counter() - t0

    def run():
        t0 = time.perf_counter()
        dev = [jnp.asarray(x) for x in chunked]  # H2D included (host link)
        res = so3_sync_large(
            *dev, C=C, T=T, chunk_t=args.chunk_t,
            maxiter=jnp.asarray(args.maxiter, jnp.int32),
            precision=args.precision, filter_dtype=args.filter_dtype,
            polish_deg=args.polish_deg, cheb_degree_warm=args.cheb_degree_warm,
        )
        r_cam = np.asarray(res.r_cam)  # forced fetch = the only real sync
        evals = np.asarray(res.evals)
        return time.perf_counter() - t0, r_cam, evals, int(res.num_iters)

    compile_s, r_cam, evals, iters = run()
    warm = [run() for _ in range(args.reps)]
    warm_s = sorted(w[0] for w in warm)[len(warm) // 2]

    ortho_err = float(np.abs(r_cam @ r_cam.transpose(0, 2, 1) - np.eye(3)).max())
    assert np.isfinite(r_cam).all() and ortho_err < 1e-2, ortho_err
    rot_mean_deg, rot_max_deg = gt_rotation_error_deg(r_cam, R_c_gt)

    oracle = None
    if args.midsize_oracle:
        # exact dense-eigh oracle at a size where it is still feasible
        # (O((3C)^3) per iteration: ~1.6 s at 3C = 6000 on a v5e)
        from vican_tpu.ops.lie import distance_so3
        from vican_tpu.solver import core

        def run_dense():
            t0 = time.perf_counter()
            res = core.so3_sync(
                jnp.asarray(KR), jnp.asarray(k_r), jnp.asarray(cam_idx),
                jnp.asarray(time_idx), C=C, T=T,
                maxiter=jnp.asarray(args.maxiter, jnp.int32),
            )
            rc = np.asarray(res.r_cam)
            return time.perf_counter() - t0, rc

        dense_compile_s, r_dense = run_dense()
        dense_warm_s, r_dense = run_dense()
        d = np.asarray(distance_so3(r_cam.astype(np.float64),
                                    r_dense.astype(np.float64)))
        dm, dx = gt_rotation_error_deg(r_dense, R_c_gt)
        oracle = {
            "dense_warm_s": round(dense_warm_s, 3),
            "dense_compile_run_s": round(dense_compile_s, 2),
            "cross_path_rot_delta_mean_deg": round(float(d.mean()), 5),
            "cross_path_rot_delta_max_deg": round(float(d.max()), 5),
            "dense_gt_rot_err_mean_deg": round(dm, 5),
            "dense_gt_rot_err_max_deg": round(dx, 5),
        }

    result = {
        "metric": f"so3_sync_large warm wall-clock ({C} cams, {T} timesteps, {E} edges, maxiter={args.maxiter})",
        "value": round(warm_s, 3),
        "unit": "s",
        "details": {
            "compile_run_s": round(compile_s, 2),
            "warm_runs_s": [round(w[0], 3) for w in warm],
            "edge_gen_s": round(gen_s, 2),
            "host_chunk_sort_s": round(chunk_s, 2),
            "iters": iters,
            "kernel_evals_max_abs": float(np.abs(evals[:3]).max()),
            "eigengap": float(abs(evals[3] / evals[2])),
            "r_cam_ortho_err": ortho_err,
            "gt_rot_err_mean_deg": round(rot_mean_deg, 5),
            "gt_rot_err_max_deg": round(rot_max_deg, 5),
            "precision": args.precision,
            "filter_dtype": args.filter_dtype,
            "polish_deg": args.polish_deg,
            "wire": not args.no_wire,
            "backend": jax.devices()[0].platform,
            "measured_with_forced_fetch": True,
        },
    }
    if oracle is not None:
        result["details"]["midsize_oracle"] = oracle
    if not args.no_save:
        out_path = os.path.join(REPO, "benchmarks", "scale_result.json")
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Minimal end-to-end solver example on a synthetic pose graph (no images).

Generates ground-truth cameras + a marker cube + noisy camera->marker edge
measurements in the reference edge-dict schema, solves the camera network
through the public API, and reports gauge-aligned errors (the main.ipynb
cell-9 protocol).  Runs in seconds on CPU or one TPU chip:

    python examples/synthetic_calibration.py [--cams 12] [--times 200]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS on hosts whose sitecustomize pins a platform (the
# axon tunnel re-applies itself at startup; the config update wins).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from vican_tpu.bipgo import bipartite_se3sync
from vican_tpu.evaluation import evaluate_calibration
from vican_tpu.synthetic import make_problem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=12)
    ap.add_argument("--times", type=int, default=200)
    ap.add_argument("--markers", type=int, default=8)
    ap.add_argument("--kappa-r", type=float, default=1e5,
                    help="Langevin rotation-noise concentration")
    ap.add_argument("--sigma-t", type=float, default=1e-4,
                    help="translation noise std (m)")
    ap.add_argument("--maxiter", type=int, default=4)
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    prob = make_problem(
        seed=args.seed, n_cams=args.cams, n_times=args.times,
        n_markers=args.markers, kappa_r=args.kappa_r, sigma_t=args.sigma_t,
    )
    pose_est = bipartite_se3sync(
        prob.edges,
        constraints=prob.constraints(),
        noise_model_r=lambda e: 1.0,
        noise_model_t=lambda e: 1.0,
        edge_filter=lambda e: True,
        maxiter=args.maxiter,
        lsqr_solver="conjugate_gradient",
        dtype=np.float32,
    )
    report = evaluate_calibration(prob.cams_gt, pose_est)
    print(report)


if __name__ == "__main__":
    main()

"""Multi-chip calibration solve over a jax.sharding.Mesh.

Demonstrates the SURVEY §2.3 scaling path: the per-edge chunk stream of the
large-graph solver is sharded over the mesh's first axis (GSPMD inserts the
collectives; partial (3C, w) operators are psum'd over ICI), while the tiny
camera block stays replicated.  The SAME dict API used single-chip
(`bipartite_se3sync(..., mesh=...)`) reaches it — no other code changes.

Run on a TPU pod slice (after `vican_tpu.parallel.init_distributed()` on
each process) or anywhere with virtual devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_solve.py

Reference parity: /root/reference vican/bipgo.py:353-490 (single-process
scipy); here the edge stream spans every device in the mesh.
"""
import os
import sys

if "XLA_FLAGS" not in os.environ and os.environ.get("JAX_PLATFORMS") == "cpu":
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS on hosts whose sitecustomize pins a platform (the
# axon tunnel): config must agree with the env var (see CLAUDE.md).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    import jax

    from vican_tpu.bipgo import bipartite_se3sync
    from vican_tpu.evaluation import evaluate_calibration
    from vican_tpu.parallel import make_mesh
    from vican_tpu.synthetic import make_problem_arrays

    # A synthetic 60-camera problem with known ground truth (the bench
    # generator at a small scale, so this example runs in seconds).
    prob = make_problem_arrays(seed=3, n_cams=60, n_times=2_000,
                               n_markers=24, n_edges=30_000,
                               kappa_r=1e4, sigma_t=1e-3)

    mesh = make_mesh()  # every visible device on one "edges" axis
    print(f"devices: {len(jax.devices())}  mesh: {mesh}")

    # Force the sharded large-graph path regardless of problem size so the
    # example exercises it (the dict API reroutes automatically past the
    # block budget; tiny problems would otherwise use the fused single-chip
    # program).
    os.environ["VICAN_TPU_BLOCK_BUDGET_BYTES"] = "1"
    try:
        pose_est = bipartite_se3sync(
            prob.edges, constraints=prob.constraints(),
            noise_model_r=lambda e: 1.0, noise_model_t=lambda e: 1.0,
            edge_filter=lambda e: True, maxiter=4,
            lsqr_solver="conjugate_gradient", dtype=np.float32,
            verbose=True, mesh=mesh,
        )
    finally:
        del os.environ["VICAN_TPU_BLOCK_BUDGET_BYTES"]

    print(evaluate_calibration(prob.cams_gt, pose_est))


if __name__ == "__main__":
    main()

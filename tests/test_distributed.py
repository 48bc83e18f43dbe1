"""Two-process jax.distributed smoke test (VERDICT r2 item 10).

The reference has no distributed backend at all (single host, mp.Pool —
SURVEY.md §2.3); ours is ``parallel.init_distributed`` + a global mesh over
every process's devices.  This test actually exercises the multi-controller
path: two OS processes, each with 4 virtual CPU devices, form one 8-device
global mesh and run the sharded large-graph solver; the replicated camera
block must match a single-process solve of the same problem.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
REPO_PATH = __REPO__
COORD = __COORD__
import json, os, sys

os.environ["JAX_PLATFORMS"] = "cpu"  # sitecustomize pins the axon plugin

import numpy as np

sys.path.insert(0, REPO_PATH)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # match tests/conftest.py

from vican_tpu.parallel import init_distributed, global_mesh

init_distributed(
    coordinator_address=COORD,
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import jax.numpy as jnp

from vican_tpu.solver import core, pack_problem
from vican_tpu.solver.scale import so3_sync_large_sharded, sort_edges_by_time
from vican_tpu.synthetic import make_problem_arrays

prob = make_problem_arrays(seed=41, n_cams=12, n_times=64, n_markers=6,
                           n_edges=1200, kappa_r=1e5, sigma_t=1e-4)
p = pack_problem(prob.edges, prob.constraints(), lambda e: 1.0, lambda e: 1.0,
                 lambda e: True, dtype=np.float64)
KR = np.asarray(core.fold_constraints(
    jnp.asarray(p.R_e), jnp.asarray(p.k_r), jnp.asarray(p.marker_idx),
    jnp.asarray(p.R_con), p.root_idx,
))
chunked = sort_edges_by_time(KR, p.k_r, p.cam_idx, p.time_idx, p.num_times, 8)
res = so3_sync_large_sharded(
    *chunked, C=p.num_cams, T=p.num_times, chunk_t=8, maxiter=4,
    mesh=global_mesh(),
)
r_cam = np.asarray(res.r_cam)  # replicated -> addressable in every process
if int(sys.argv[1]) == 0:
    with open(sys.argv[2], "w") as f:
        json.dump({"r_cam": r_cam.tolist(),
                   "n_iters": int(res.num_iters)}, f)
jax.distributed.shutdown()
"""


def test_two_process_global_mesh_solver_parity(tmp_path):
    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    out_file = str(tmp_path / "rank0.json")
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(WORKER.replace("__REPO__", repr(REPO)).replace("__COORD__", repr(coord)))

    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    env.pop("JAX_PLATFORM_NAME", None)
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(rank), out_file],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for rank in range(2)
    ]
    outputs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=540)
        outputs.append(out.decode(errors="replace"))
    for pr, out in zip(procs, outputs):
        assert pr.returncode == 0, out[-3000:]

    with open(out_file) as f:
        dist = json.load(f)
    r_cam_dist = np.asarray(dist["r_cam"])

    # single-process oracle (this process: 8 virtual CPU devices via conftest)
    import jax.numpy as jnp

    from vican_tpu.parallel import make_mesh
    from vican_tpu.solver import core, pack_problem
    from vican_tpu.solver.scale import so3_sync_large_sharded, sort_edges_by_time
    from vican_tpu.synthetic import make_problem_arrays

    prob = make_problem_arrays(seed=41, n_cams=12, n_times=64, n_markers=6,
                               n_edges=1200, kappa_r=1e5, sigma_t=1e-4)
    p = pack_problem(prob.edges, prob.constraints(), lambda e: 1.0,
                     lambda e: 1.0, lambda e: True, dtype=np.float64)
    KR = np.asarray(core.fold_constraints(
        jnp.asarray(p.R_e), jnp.asarray(p.k_r), jnp.asarray(p.marker_idx),
        jnp.asarray(p.R_con), p.root_idx,
    ))
    chunked = sort_edges_by_time(KR, p.k_r, p.cam_idx, p.time_idx, p.num_times, 8)
    single = so3_sync_large_sharded(
        *chunked, C=p.num_cams, T=p.num_times, chunk_t=8, maxiter=4,
        mesh=make_mesh(),
    )
    from vican_tpu.ops.lie import distance_so3

    d = np.asarray(distance_so3(np.asarray(single.r_cam), r_cam_dist))
    # same math; cross-process psum reduction order adds ~1e-6 deg of f64
    # noise on this fixture
    assert d.max() < 1e-4, d.max()

"""Multi-chip sharded solver: 8-virtual-device mesh vs single-device parity."""
import numpy as np
import jax
import pytest

from vican_tpu import bipgo
from vican_tpu.parallel import make_mesh, se3sync_sharded, so3_sync_sharded
from vican_tpu.solver import core, pack_problem
from vican_tpu.synthetic import make_problem


@pytest.fixture(scope="module")
def packed():
    prob = make_problem(seed=11, n_cams=8, n_times=64, n_markers=6, kappa_r=1e5, sigma_t=1e-4)
    return (
        prob,
        pack_problem(prob.edges, prob.constraints(), lambda e: 1.0, lambda e: 1.0, lambda e: True),
    )


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_so3_sync_sharded_matches_single(packed):
    prob, p = packed
    import jax.numpy as jnp

    KR = core.fold_constraints(
        jnp.asarray(p.R_e), jnp.asarray(p.k_r), jnp.asarray(p.marker_idx),
        jnp.asarray(p.R_con), p.root_idx,
    )
    single = core.so3_sync(
        KR, jnp.asarray(p.k_r), jnp.asarray(p.cam_idx), jnp.asarray(p.time_idx),
        C=p.num_cams, T=p.num_times, maxiter=jnp.asarray(4, jnp.int32),
    )
    mesh = make_mesh()
    sharded = so3_sync_sharded(
        np.asarray(KR), p.k_r, p.cam_idx, p.time_idx,
        C=p.num_cams, T=p.num_times, maxiter=4, mesh=mesh, dtype=np.float64,
    )
    assert np.allclose(np.asarray(single.r_cam), np.asarray(sharded.r_cam), atol=1e-8)
    assert np.allclose(np.asarray(single.r_time), np.asarray(sharded.r_time), atol=1e-8)


def test_full_se3sync_sharded_matches_api(packed):
    prob, p = packed
    mesh = make_mesh()
    r_cam, r_time, t_est, res = se3sync_sharded(p, maxiter=4, mesh=mesh, dtype=np.float64)
    assert res < 1e-3

    pose_est = bipgo.bipartite_se3sync(
        prob.edges, constraints=prob.constraints(),
        noise_model_r=lambda e: 1.0, noise_model_t=lambda e: 1.0,
        edge_filter=lambda e: True, maxiter=4, dtype=np.float64, verbose=False,
    )
    for i, c in enumerate(p.cam_ids):
        assert np.allclose(r_cam[i], np.asarray(pose_est[c].R()), atol=1e-6)
        # translations agree up to the shared CG tolerance
        assert np.allclose(t_est[i], pose_est[c].t(), atol=1e-3)


def test_perception_mesh_matches_single(tmp_path):
    """Data-parallel perception over the 8-device mesh == single device."""
    import cv2 as cv

    pytest_cv = cv  # importorskip happens at module scope in other files
    from vican_tpu.cam import Camera, estimate_pose_mp
    from vican_tpu.render import look_at, make_cube_markers, render_dataset
    from vican_tpu.geometry import SE3, rodrigues
    from vican_tpu.dataset import Dataset

    rng = np.random.default_rng(5)
    K = np.array([[400.0, 0, 256], [0, 400.0, 144], [0, 0, 1]])
    cams = {
        str(i): Camera(id=str(i), intrinsics=K, distortion=np.zeros(12),
                       extrinsics=look_at(p, (0, 0, 1.0)), resolution_x=512, resolution_y=288)
        for i, p in enumerate([(1.8, 0, 1.1), (0, 1.8, 1.2)])
    }
    markers = make_cube_markers()
    traj = {}
    for t in range(4):
        v = rng.normal(size=3)
        v = v / np.linalg.norm(v) * rng.uniform(0, np.pi)
        traj[str(t)] = SE3(R=rodrigues(v), t=np.array([0.0, 0.0, 1.0]))
    root = str(tmp_path / "ds")
    render_dataset(root, cams, traj, markers, marker_size=0.138, marker_px=120)
    ds = Dataset(root)

    kwargs = dict(
        im_filenames=ds.im_data["filename"], cams=ds.im_data["cam"],
        aruco="DICT_4X4_1000", marker_size=0.138,
        corner_refine="CORNER_REFINE_APRILTAG", marker_ids=[str(i) for i in range(24)],
        flags="SOLVEPNP_IPPE_SQUARE", brightness=0, contrast=0, batch_size=8,
        verbose=False,
    )
    single = estimate_pose_mp(**kwargs)
    mesh = make_mesh()
    sharded = estimate_pose_mp(mesh=mesh, **kwargs)
    # the mesh run must take the sharded tile transport, not a fallback
    # (a silent reroute to the full-frame gather program would still pass
    # the equality checks below — VERDICT r4 item 5)
    from vican_tpu import perception

    assert any(k[0] == "roitile_mesh" for k in perception._DOM_INDEX)
    # detection-identical: same marker set, same corners (all stages are
    # per-image independent, so sharding only changes the batch blocking)
    assert set(single.keys()) == set(sharded.keys())
    for k in single:
        assert np.allclose(single[k]["corners"], sharded[k]["corners"], atol=1e-4)
        assert np.allclose(single[k]["pose"].t(), sharded[k]["pose"].t(), atol=1e-5)


def test_global_mesh_and_distributed_hook():
    """Multi-host hook surface: global_mesh spans all (virtual) devices and
    init_distributed no-ops when the runtime is already initialized."""
    import jax

    from vican_tpu.parallel import global_mesh, init_distributed

    m = global_mesh()
    assert m.axis_names == ("edges",)
    assert m.devices.size == len(jax.devices())
    # guard path: pretend the runtime is up; the call must be a no-op
    import jax._src.distributed as dist

    class _Fake:
        client = object()

    orig = dist.global_state
    dist.global_state = _Fake()
    try:
        init_distributed()  # must not reach jax.distributed.initialize
    finally:
        dist.global_state = orig

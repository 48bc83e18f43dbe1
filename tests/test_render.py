"""Scene-generation machinery: keep-out, visibility gating, occluders,
render-farm sharding + resume (reference render.py:164-205, 297-371,
374-390, 491-519)."""
import os

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from vican_tpu.cam import Camera, estimate_pose_mp
from vican_tpu.dataset import Dataset
from vican_tpu.geometry import SE3, rodrigues
from vican_tpu.render import (
    boxes_intersect,
    cams_seeing,
    cube_pose_candidate,
    look_at,
    make_cube_markers,
    render_dataset,
    render_image,
)


def _cam(cid, pos, target=(0, 0, 1.0), res=(640, 360), f=550.0):
    W, H = res
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])
    return Camera(id=cid, intrinsics=K, distortion=np.zeros(12),
                  extrinsics=look_at(pos, target), resolution_x=W,
                  resolution_y=H)


class TestGeometry:
    def test_obb_separated_and_overlapping(self):
        eye = np.eye(3)
        assert boxes_intersect([0, 0, 0], [1, 1, 1], eye, [1.5, 0, 0], [1, 1, 1], eye)
        assert not boxes_intersect([0, 0, 0], [1, 1, 1], eye, [2.5, 0, 0], [1, 1, 1], eye)
        # rotated: a 45-deg box whose corner reaches into the gap
        R = rodrigues(np.array([0, 0, np.pi / 4]))
        assert boxes_intersect([0, 0, 0], [1, 1, 1], eye, [2.2, 0, 0], [1, 1, 1], R)
        # edge-cross separating axis: thin sticks crossing without touching
        Rx = rodrigues(np.array([np.pi / 2, 0, 0]))
        assert not boxes_intersect(
            [0, 0, 0], [2, 0.1, 0.1], eye, [0, 0, 1.0], [2, 0.1, 0.1], Rx)

    def test_cams_seeing(self):
        cams = {"a": _cam("a", (3, 0, 1)), "b": _cam("b", (0, 3, 1)),
                "far": _cam("far", (20, 0, 1))}
        seen = cams_seeing(cams, (0, 0, 1.0), distance_cutoff=7.0)
        assert set(seen) == {"a", "b"}  # "far" fails the 7 m cutoff
        assert cams_seeing(cams, (100, 0, 1.0)) == []

    def test_cube_pose_candidate_gates(self):
        cams = {"a": _cam("a", (3, 0, 1)), "b": _cam("b", (0, 3, 1))}
        rng = np.random.default_rng(0)
        keep_out = [((0.0, 0.0, 1.0), (0.45, 0.45, 0.45))]
        half = 0.575 / 2
        for _ in range(10):
            pose = cube_pose_candidate(
                rng, cams, (-0.8, -0.8, 0.4), (0.8, 0.8, 1.6),
                keep_out=keep_out, min_views=2,
            )
            assert pose is not None
            assert not boxes_intersect(
                pose.t(), [half] * 3, pose.R(),
                keep_out[0][0], keep_out[0][1], np.eye(3))
            assert len(cams_seeing(cams, pose.t())) >= 2
        # an impossible region (all inside keep-out) yields None
        assert cube_pose_candidate(
            rng, cams, (-0.1, -0.1, 0.9), (0.1, 0.1, 1.1),
            keep_out=[((0, 0, 1.0), (3, 3, 3))], max_tries=20,
        ) is None


class TestOcclusion:
    def test_occluder_hides_marker(self, tmp_path):
        cam = _cam("0", (2.0, 0.0, 1.0), target=(0, 0, 1.0))
        markers = make_cube_markers()
        obj = SE3(R=np.eye(3), t=np.array([0, 0, 1.0]))
        marker_world = {m: obj @ mp for m, mp in markers.items()}
        from vican_tpu.ops.dictionary import get_dictionary

        bits, n = get_dictionary("DICT_4X4_1000")
        cells = n + 2
        ims = {}
        for mid in markers:
            tile = np.zeros((cells, cells), np.uint8)
            tile[1:-1, 1:-1] = bits[int(mid)] * 255
            ims[mid] = np.kron(tile, np.ones((20, 20), np.uint8))

        clear = render_image(cam, marker_world, ims, 0.2)
        box = (SE3(R=np.eye(3), t=np.array([1.0, 0, 1.0])), (0.05, 0.6, 0.6))
        blocked = render_image(cam, marker_world, ims, 0.2, occluders=[box])

        import cv2 as cv2_

        d = cv2_.aruco.ArucoDetector(
            cv2_.aruco.getPredefinedDictionary(cv2_.aruco.DICT_4X4_1000),
            cv2_.aruco.DetectorParameters())
        n_clear = len(d.detectMarkers(clear)[0])
        n_blocked = len(d.detectMarkers(blocked)[0])
        assert n_clear >= 4
        assert n_blocked == 0, n_blocked  # the slab covers the whole cube

    def test_partial_occluder_keeps_unblocked_markers(self):
        cam = _cam("0", (2.0, 0.0, 1.0), target=(0, 0, 1.0))
        markers = make_cube_markers()
        obj = SE3(R=np.eye(3), t=np.array([0, 0, 1.0]))
        marker_world = {m: obj @ mp for m, mp in markers.items()}
        from vican_tpu.ops.dictionary import get_dictionary

        bits, n = get_dictionary("DICT_4X4_1000")
        cells = n + 2
        ims = {}
        for mid in markers:
            tile = np.zeros((cells, cells), np.uint8)
            tile[1:-1, 1:-1] = bits[int(mid)] * 255
            ims[mid] = np.kron(tile, np.ones((20, 20), np.uint8))
        # a narrow pillar hides roughly half the cube face
        box = (SE3(R=np.eye(3), t=np.array([1.0, 0.12, 1.0])), (0.05, 0.12, 0.6))
        img = render_image(cam, marker_world, ims, 0.2, occluders=[box])
        import cv2 as cv2_

        d = cv2_.aruco.ArucoDetector(
            cv2_.aruco.getPredefinedDictionary(cv2_.aruco.DICT_4X4_1000),
            cv2_.aruco.DetectorParameters())
        n_part = len(d.detectMarkers(img)[0])
        assert 1 <= n_part <= 3, n_part


class TestRenderFarm:
    def test_shard_resume_and_dataset_merge(self, tmp_path):
        root = str(tmp_path / "ds")
        cams = {"0": _cam("0", (2.2, 0.3, 1.2))}
        markers = make_cube_markers()
        rng = np.random.default_rng(5)
        traj = {}
        for t in range(4):
            v = rng.normal(size=3)
            v = v / np.linalg.norm(v) * rng.uniform(0, np.pi)
            traj[str(t)] = SE3(R=rodrigues(v), t=np.array([0, 0, 1.0]))

        # two "cores" render interleaved stripes into per-shard pose files
        for core in range(2):
            render_dataset(root, cams, traj, markers, marker_size=0.2,
                           shard=(core, 2))
        assert os.path.exists(os.path.join(root, "object_pose_0.json"))
        assert os.path.exists(os.path.join(root, "object_pose_1.json"))
        ds = Dataset(root)
        assert set(ds.object.keys()) == {"0", "1", "2", "3"}
        assert len(ds.im_data["filename"]) == 4

        # resume: drop one image + its pose entry, re-run only that shard
        victim = os.path.join(root, "2", "0.jpg")
        os.remove(victim)
        mtimes = {t: os.path.getmtime(os.path.join(root, t, "0.jpg"))
                  for t in ("0", "1", "3")}
        render_dataset(root, cams, traj, markers, marker_size=0.2,
                       shard=(0, 2), resume=True)
        assert os.path.exists(victim)  # re-rendered
        for t, mt in mtimes.items():
            if t in ("0",):  # shard 0's OTHER timestep was skipped
                assert os.path.getmtime(os.path.join(root, t, "0.jpg")) == mt

    def test_only_visible_cams(self, tmp_path):
        root = str(tmp_path / "vis")
        cams = {"near": _cam("near", (2.0, 0.0, 1.0)),
                "far": _cam("far", (30.0, 0.0, 1.0), target=(0, 0, 1.0))}
        markers = make_cube_markers()
        traj = {"0": SE3(R=np.eye(3), t=np.array([0, 0, 1.0]))}
        render_dataset(root, cams, traj, markers, marker_size=0.2,
                       only_visible_cams=True)
        assert os.path.exists(os.path.join(root, "0", "near.jpg"))
        assert not os.path.exists(os.path.join(root, "0", "far.jpg"))

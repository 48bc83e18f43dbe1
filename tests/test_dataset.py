"""Dataset loaders and edge-dict serialization."""
import json
import os
import sys

import numpy as np
import pytest

from vican_tpu.dataset import Dataset, DojoDataset
from vican_tpu.geometry import SE3
from vican_tpu.serialization import load_edges, save_edges, save_edges_npz, load_edges_npz

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "vican"))


@pytest.fixture
def render_layout(tmp_path):
    """Minimal Blender-render directory layout (render.py output format)."""
    root = tmp_path / "ds"
    root.mkdir()
    cams = {}
    rng = np.random.default_rng(0)
    for cid in ["0", "1", "7"]:
        cams[cid] = {
            "fx": 600.0, "fy": 610.0, "cx": 640.0, "cy": 360.0,
            "distortion": [0.0] * 12,
            "R": np.eye(3).tolist(),
            "t": rng.normal(size=3).tolist(),
            "resolution_x": 1280, "resolution_y": 720,
        }
    (root / "cameras.json").write_text(json.dumps(cams))
    for t in ["0", "1", "5"]:
        (root / t).mkdir()
        for cid in ["0", "1"]:
            (root / t / f"{cid}.jpg").write_bytes(b"\xff\xd8fake")
    # also a non-numeric dir and a stray file that must be ignored
    (root / "notes").mkdir()
    (root / "README.txt").write_text("x")
    obj = {"0": {"R": np.eye(3).tolist(), "t": [0, 0, 0]},
           "5": {"R": np.eye(3).tolist(), "t": [1, 2, 3]}}
    (root / "object_pose_0.json").write_text(json.dumps(obj))
    return str(root)


class TestDataset:
    def test_load(self, render_layout):
        ds = Dataset(render_layout)
        assert set(ds.cams.keys()) == {"0", "1", "7"}
        assert ds.cams["0"].intrinsics[0, 0] == 600.0
        assert ds.cams["0"].intrinsics[1, 2] == 360.0
        assert len(ds.im_data["filename"]) == 6
        assert set(ds.im_data["timestamp"]) == {"0", "1", "5"}
        assert all(c.id == i for c, i in zip(ds.im_data["cam"], ds.im_data["cam_id"]))
        assert set(ds.object.keys()) == {"0", "5"}
        assert np.allclose(ds.object["5"].t(), [1, 2, 3])

    def test_missing_cameras_json(self, tmp_path):
        with pytest.raises(AssertionError):
            Dataset(str(tmp_path))

    def test_dojo_layout(self, tmp_path):
        root = tmp_path
        (root / "cameras_intrinsics.json").write_text(json.dumps({
            "camA": {"intrinsics": np.eye(3).tolist(), "distortion": [0.0] * 12}}))
        pose = np.eye(4); pose[:3, 3] = [1, 2, 3]
        (root / "cameras_transformations_to_origin_ground_truth.json").write_text(
            json.dumps({"camA": pose.tolist()}))
        (root / "aruco_cube_transformations.json").write_text(json.dumps({
            "to": {"3": pose.tolist()}}))
        imdir = root / "aruco_images_samples" / "0"
        imdir.mkdir(parents=True)
        (imdir / "camA.jpg").write_bytes(b"x")
        ds = DojoDataset(str(root))
        assert "camA" in ds.cams
        # constraints are inverted 'to' transforms
        assert np.allclose(ds.object_constraints["3"].t(), -np.array([1, 2, 3]), atol=1e-6)
        assert len(ds.im_data["filename"]) == 1


def _make_edges(n=5):
    rng = np.random.default_rng(0)
    edges = {}
    for i in range(n):
        edges[(str(i % 2), f"{i}_3")] = {
            "pose": SE3(R=np.eye(3), t=rng.normal(size=3)),
            "corners": rng.uniform(0, 100, size=(4, 2)),
            "reprojected_err": float(rng.uniform()),
            "im_filename": f"{i}/cam.jpg",
        }
    return edges


class TestSerialization:
    def test_pt_roundtrip(self, tmp_path):
        edges = _make_edges()
        p = str(tmp_path / "edges.pt")
        save_edges(p, edges)
        back = load_edges(p)
        assert set(back.keys()) == set(edges.keys())
        for k in edges:
            assert isinstance(back[k]["pose"], SE3)
            assert np.allclose(back[k]["pose"].t(), edges[k]["pose"].t())
            assert np.allclose(back[k]["corners"], edges[k]["corners"])

    def test_npz_roundtrip(self, tmp_path):
        edges = _make_edges()
        p = str(tmp_path / "edges.npz")
        save_edges_npz(p, edges)
        back = load_edges_npz(p)
        assert set(back.keys()) == set(edges.keys())
        for k in edges:
            assert np.allclose(back[k]["pose"].t(), edges[k]["pose"].t(), atol=1e-6)
            assert np.allclose(back[k]["corners"], edges[k]["corners"], atol=1e-5)
            assert back[k]["im_filename"] == edges[k]["im_filename"]

    @pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkout not available")
    def test_load_reference_pickled_pt(self, tmp_path):
        """The real interchange test: a .pt written with the *reference*
        package's SE3 class must load through our shim (README.md:18)."""
        import torch

        sys.path.insert(0, REFERENCE)
        from vican.geometry import SE3 as RefSE3

        rng = np.random.default_rng(1)
        ref_edges = {
            ("2", "10_5"): {
                "pose": RefSE3(R=np.eye(3), t=rng.normal(size=3)),
                "corners": rng.uniform(0, 100, size=(4, 2)),
                "reprojected_err": 0.01,
                "im_filename": "10/2.jpg",
            }
        }
        p = str(tmp_path / "cam_marker_edges.pt")
        torch.save(ref_edges, p)
        back = load_edges(p)
        pose = back[("2", "10_5")]["pose"]
        assert isinstance(pose, SE3)  # OUR class, not the reference's
        assert np.allclose(pose.t(), ref_edges[("2", "10_5")]["pose"].t())
        assert np.allclose(pose.R(), np.eye(3))

"""Visualization-layer tests (VERDICT r3 weak #5 / item 6).

Covers plot2D (gauge transforms, all three views, inversion, error paths),
plot_cams_3D (matplotlib fallback), draw_marker, and detect_and_draw (runs
the real detector on a composed fixture) — reference vican/plot.py:16-221.
"""
import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from vican_tpu.cam import Camera
from vican_tpu.geometry import SE3, rodrigues
from vican_tpu.plot import detect_and_draw, draw_marker, plot2D, plot_cams_3D


class RecordingAx:
    """Minimal matplotlib-Axes stand-in capturing scatter() calls."""

    def __init__(self):
        self.calls = []

    def scatter(self, x, y, s, marker=None, c=None):
        self.calls.append((np.asarray(x), np.asarray(y), s, marker, c))


def _pose(seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=3)
    v = v / np.linalg.norm(v) * rng.uniform(0.1, np.pi - 0.1)
    return SE3(R=rodrigues(v), t=rng.normal(size=3))


class TestPlot2D:
    def setup_method(self):
        self.data = {str(i): _pose(i) for i in range(5)}
        self.GL = _pose(100)
        self.GR = _pose(101)

    @pytest.mark.parametrize("view,sl", [("xy", [0, 1]), ("xz", [0, 2]), ("yz", [1, 2])])
    @pytest.mark.parametrize("invert", [False, True])
    def test_views_match_hand_computed_gauge_transform(self, view, sl, invert):
        ax = RecordingAx()
        plot2D(ax, self.data, view=view, marker="x", s=30, c="blue",
               invert=invert, left_gauge=self.GL, right_gauge=self.GR)
        (x, y, s, marker, c) = ax.calls[0]
        expect = []
        for k in self.data:
            pose = self.GL @ self.data[k] @ self.GR
            xyz = pose.inv().t() if invert else pose.t()
            expect.append(xyz[sl])
        expect = np.stack(expect)
        np.testing.assert_allclose(x, expect[:, 0], atol=1e-6)
        np.testing.assert_allclose(y, expect[:, 1], atol=1e-6)
        assert marker == "x" and s == 30 and c == "blue"

    def test_camera_entries_and_idx_subset(self):
        cams = {
            str(i): Camera(id=str(i), intrinsics=np.eye(3), distortion=np.zeros(12),
                           extrinsics=_pose(10 + i), resolution_x=64, resolution_y=64)
            for i in range(4)
        }
        ax = RecordingAx()
        plot2D(ax, cams, view="xy", marker=".", s=5, c="red", idx=["1", "3"])
        x, y, *_ = ax.calls[0]
        expect = np.stack([cams[k].extrinsics.t()[:2] for k in ["1", "3"]])
        np.testing.assert_allclose(x, expect[:, 0], atol=1e-6)
        np.testing.assert_allclose(y, expect[:, 1], atol=1e-6)

    def test_default_gauges_are_identity(self):
        ax = RecordingAx()
        plot2D(ax, self.data, view="xy", marker="x", s=1, c="k")
        x, y, *_ = ax.calls[0]
        expect = np.stack([self.data[k].t()[:2] for k in self.data])
        np.testing.assert_allclose(x, expect[:, 0], atol=1e-6)
        np.testing.assert_allclose(y, expect[:, 1], atol=1e-6)

    def test_unknown_view_raises(self):
        with pytest.raises(ValueError):
            plot2D(RecordingAx(), self.data, view="zz", marker="x", s=1, c="k")

    def test_non_pose_entry_raises(self):
        with pytest.raises(TypeError):
            plot2D(RecordingAx(), {"a": np.eye(4)}, view="xy", marker="x", s=1, c="k")


class TestPlotCams3D:
    def _cams(self, n=3):
        return [
            Camera(id=str(i), intrinsics=np.eye(3), distortion=np.zeros(12),
                   extrinsics=_pose(20 + i), resolution_x=64, resolution_y=64)
            for i in range(n)
        ]

    def test_matplotlib_fallback(self, monkeypatch):
        import sys

        # force the ImportError branch even on hosts that have plotly
        monkeypatch.setitem(sys.modules, "plotly", None)
        monkeypatch.setitem(sys.modules, "plotly.express", None)
        cams = self._cams(3)
        fig = plot_cams_3D(cams, scale=0.4)
        assert fig is not None
        ax = fig.axes[0]
        assert ax.name == "3d"
        # one RGB axis triad (3 lines) per camera
        assert len(ax.lines) == 3 * len(cams)
        # scattered centers match the extrinsics translations
        xs, ys, zs = ax.collections[0]._offsets3d
        centers = np.stack([c.extrinsics.t() for c in cams])
        np.testing.assert_allclose(np.asarray(xs, float), centers[:, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(zs, float), centers[:, 2], atol=1e-6)
        import matplotlib.pyplot as plt

        plt.close(fig)


class TestMarkerOverlay:
    def test_draw_marker_draws_quad_and_label(self):
        im = np.zeros((120, 160, 3), np.uint8)
        quad = np.array([[20.0, 30.0], [90.0, 30.0], [90.0, 100.0], [20.0, 100.0]])
        out = draw_marker(im, quad, "7")
        # green quad edges present
        assert (out[30, 20:90, 1] == 255).any()
        assert (out[30:100, 90, 1] == 255).any()
        # red id label above the top-left corner
        assert (out[:30, :, 2] == 255).any()

    def test_draw_marker_without_id(self):
        im = np.zeros((64, 64, 3), np.uint8)
        quad = np.array([[10.0, 10.0], [50.0, 10.0], [50.0, 50.0], [10.0, 50.0]])
        out = draw_marker(im, quad, None)
        assert (out[..., 1] == 255).any()
        assert not (out[..., 2] == 255).any()  # no label drawn

    def test_detect_and_draw_ids_match_detector(self, tmp_path, capsys):
        import cv2 as cv

        # compose a clean two-marker scene (same style as tests/test_detect)
        cvd = cv.aruco.getPredefinedDictionary(cv.aruco.DICT_4X4_1000)
        img = np.full((360, 480), 170, np.uint8)
        for mid, (x, y), size in [(3, (60, 60), 96), (17, (280, 180), 120)]:
            img[y : y + size, x : x + size] = cvd.generateImageMarker(mid, size)
        fn = str(tmp_path / "scene.png")
        cv.imwrite(fn, img)

        vis = detect_and_draw(fn, aruco="DICT_4X4_1000")
        printed = capsys.readouterr().out.strip().splitlines()[-1]
        assert printed == "[3, 17]", printed
        assert vis.shape == (360, 480, 3)
        assert (vis[..., 1] == 255).any()  # overlays drawn

    def test_detect_and_draw_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            detect_and_draw("/nonexistent/im.jpg", aruco="DICT_4X4_1000")

"""Marker detection kernels vs the OpenCV oracle and ground truth."""
import numpy as np
import pytest

cv = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from vican_tpu.ops import detect
from vican_tpu.ops.dictionary import marker_bits_table

DICT = "DICT_4X4_1000"


@pytest.fixture(scope="module")
def table():
    return jnp.asarray(marker_bits_table(DICT))


@pytest.fixture(scope="module")
def cv_dict():
    return cv.aruco.getPredefinedDictionary(cv.aruco.DICT_4X4_1000)


class TestPreprocess:
    def test_reference_formula_parity(self):
        rng = np.random.default_rng(0)
        im = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        b, c = -150, 120
        # reference math (cam.py:137-145)
        ref = np.int16(im)
        ref = ref * (c / 127 + 1) - c
        ref = ref + b
        ref = np.clip(ref, 0, 255)
        ref = np.uint8(ref)
        ref_gray = cv.cvtColor(ref, cv.COLOR_BGR2GRAY)
        ours = np.asarray(detect.preprocess(jnp.asarray(im), b, c))
        assert np.abs(ours - ref_gray).max() <= 1.0  # rounding-mode slack

    def test_identity_when_zero(self):
        rng = np.random.default_rng(1)
        im = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        ours = np.asarray(detect.preprocess(jnp.asarray(im)))
        assert np.array_equal(ours, im.astype(np.float32))


class TestThreshold:
    def test_matches_cv_adaptive_threshold(self):
        rng = np.random.default_rng(2)
        im = rng.integers(0, 256, size=(64, 80), dtype=np.uint8)
        for win in (3, 9, 13):
            ref = cv.adaptiveThreshold(
                im, 255, cv.ADAPTIVE_THRESH_MEAN_C, cv.THRESH_BINARY_INV, win, 10
            )
            ours = np.asarray(detect.adaptive_threshold(jnp.asarray(im, jnp.float32), win, 10.0))
            agree = (ours == (ref > 0)).mean()
            assert agree > 0.98, (win, agree)  # boundary rounding differences only


class TestCCL:
    def test_two_blobs(self):
        fg = np.zeros((32, 32), bool)
        fg[4:10, 4:10] = True
        fg[20:28, 15:25] = True
        labels = np.asarray(detect.connected_components(jnp.asarray(fg), 8))
        l1 = labels[5, 5]
        l2 = labels[22, 18]
        assert l1 != l2
        assert (labels[4:10, 4:10] == l1).all()
        assert (labels[20:28, 15:25] == l2).all()
        assert (labels[0, 0] == int(detect.BIG))

    def test_ring_component(self):
        fg = np.zeros((40, 40), bool)
        fg[5:35, 5:35] = True
        fg[10:30, 10:30] = False  # hollow ring like a marker border
        labels = np.asarray(detect.connected_components(jnp.asarray(fg), 10))
        ring_labels = np.unique(labels[fg])
        assert len(ring_labels) == 1


def compose_scene(cv_dict, specs, shape=(360, 480), bg=170):
    """Paste markers into a gray image; returns (img, {id: gt_corners})."""
    img = np.full(shape, bg, np.uint8)
    gt = {}
    for mid, size, (y, x), rot in specs:
        m = cv_dict.generateImageMarker(mid, size)
        m = np.rot90(m, k=rot)
        img[y : y + size, x : x + size] = m
        # physical corner positions (pixel-edge convention), canonical order
        tl = np.array([x - 0.5, y - 0.5])
        quad = np.array([tl, tl + [size, 0], tl + [size, size], tl + [0, size]])
        gt[mid] = np.roll(quad, rot, axis=0)  # rotated paste moves canonical TL
    return img, gt


class TestDetectMarkers:
    def test_scene_ids_and_corners(self, table, cv_dict):
        img, gt = compose_scene(
            cv_dict,
            [(7, 96, (40, 60), 0), (42, 72, (200, 300), 1), (0, 36, (60, 380), 0)],
        )
        out = detect.detect_markers(
            detect.preprocess(jnp.asarray(img)), table, 4, detect.DetectorParams()
        )
        v = np.asarray(out.valid)
        found = {int(i): np.asarray(c) for i, c, ok in zip(out.ids, out.corners, v) if ok}
        assert set(found) == set(gt)
        for mid, quad_gt in gt.items():
            err = np.abs(found[mid] - quad_gt).max()
            assert err < 0.35, (mid, err, found[mid], quad_gt)

    def test_agrees_with_cv_detector(self, table, cv_dict):
        img, _ = compose_scene(
            cv_dict, [(3, 80, (30, 30), 0), (999, 60, (250, 380), 2), (500, 48, (150, 200), 3)]
        )
        params_cv = cv.aruco.DetectorParameters()
        params_cv.cornerRefinementMethod = cv.aruco.CORNER_REFINE_APRILTAG
        cs, ids, _ = cv.aruco.ArucoDetector(cv_dict, params_cv).detectMarkers(img)
        cv_ids = set(ids.ravel().tolist())
        out = detect.detect_markers(
            detect.preprocess(jnp.asarray(img)), table, 4, detect.DetectorParams()
        )
        v = np.asarray(out.valid)
        ours = {int(i) for i, ok in zip(out.ids, v) if ok}
        assert ours == cv_ids
        # corner agreement within the 0.5px convention offset + refinement slack
        cv_map = {int(i): c.squeeze() for c, i in zip(cs, ids.ravel())}
        our_map = {int(i): np.asarray(c) for i, c, ok in zip(out.ids, out.corners, v) if ok}
        for mid in cv_ids:
            err = np.abs(our_map[mid] + 0.5 - cv_map[mid]).max()
            assert err < 0.6, (mid, err)

    def test_warped_marker_subpixel(self, table, cv_dict):
        N = 120
        marker = cv_dict.generateImageMarker(11, N)
        sq = np.array([[0, 0], [N, 0], [N, N], [0, N]], np.float32)
        ang = np.deg2rad(33)
        R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        dst = (((sq - sq.mean(0)) @ R.T) * 0.9 + np.array([240, 180])).astype(np.float32)
        H = cv.getPerspectiveTransform(sq, dst)
        img = np.full((360, 480), 170, np.uint8)
        img = cv.warpPerspective(marker, H, (480, 360), img, borderMode=cv.BORDER_TRANSPARENT)
        p = np.concatenate([sq - 0.5, np.ones((4, 1), np.float32)], 1) @ H.T
        gt = p[:, :2] / p[:, 2:]
        out = detect.detect_markers(
            detect.preprocess(jnp.asarray(img)), table, 4, detect.DetectorParams()
        )
        v = np.asarray(out.valid)
        found = {int(i): np.asarray(c) for i, c, ok in zip(out.ids, out.corners, v) if ok}
        assert 11 in found
        assert np.abs(found[11] - gt).max() < 0.3

    def test_empty_image(self, table):
        img = np.full((240, 320), 128, np.uint8)
        out = detect.detect_markers(
            detect.preprocess(jnp.asarray(img)), table, 4, detect.DetectorParams()
        )
        assert not np.asarray(out.valid).any()

    def test_preprocessed_dark_scene(self, table, cv_dict):
        """Reference uses brightness=-150, contrast=120 (main.ipynb cell 3)."""
        img, gt = compose_scene(cv_dict, [(5, 90, (100, 100), 0)], bg=200)
        # simulate an over-bright render; preprocessing should normalize it
        bright = np.clip(img.astype(np.int32) + 60, 0, 255).astype(np.uint8)
        out = detect.detect_markers(
            detect.preprocess(jnp.asarray(bright), -150, 120), table, 4,
            detect.DetectorParams(),
        )
        v = np.asarray(out.valid)
        found = {int(i) for i, ok in zip(out.ids, v) if ok}
        assert 5 in found


class TestErrorCorrection:
    def test_budget_from_dictionary_min_distance(self):
        from vican_tpu.ops.dictionary import max_correction_bits, min_hamming_distance

        assert min_hamming_distance("DICT_4X4_1000") == 2
        assert max_correction_bits("DICT_4X4_1000") == 0
        assert max_correction_bits("DICT_6X6_250") == 5
        p = detect.resolve_error_correction(detect.DetectorParams(), "DICT_6X6_250")
        assert p.error_correction_bits == 3  # floor(0.6 * 5), cv2 convention
        p = detect.resolve_error_correction(detect.DetectorParams(), "DICT_4X4_1000")
        assert p.error_correction_bits == 0  # correction unsafe at tau = 2
        explicit = detect.DetectorParams(error_correction_bits=1)
        assert detect.resolve_error_correction(explicit, "DICT_6X6_250").error_correction_bits == 1

    def test_corrects_flipped_bits_without_false_ids(self):
        """Bit flips within the budget decode to the right id; strict matching
        misses them; flips never produce a different id (unique-decoding
        radius guarantee)."""
        name = "DICT_6X6_250"
        cvd = cv.aruco.getPredefinedDictionary(cv.aruco.DICT_6X6_250)
        table6 = jnp.asarray(marker_bits_table(name))
        params = detect.resolve_error_correction(detect.DetectorParams(), name)
        size = 120  # cells = 8 -> 15 px per cell
        # isolated interior flips (not border-adjacent, not adjacent to each
        # other): clustered flipped cells merge into a black blob that breaks
        # the adaptive-threshold ring itself — a segmentation failure mode
        # shared with OpenCV, not a decode-correction case
        for mid, flipped in [(17, [(4, 5)]), (42, [(2, 2), (4, 5)]),
                             (3, [(2, 2), (2, 5), (5, 2)])]:
            nflip = len(flipped)
            m = cvd.generateImageMarker(mid, size)
            cell = size // 8
            for r, c in flipped:
                sl = np.s_[r * cell : (r + 1) * cell, c * cell : (c + 1) * cell]
                m[sl] = 255 - m[sl]
            img = np.full((240, 320), 170, np.uint8)
            img[40 : 40 + size, 60 : 60 + size] = m
            gray = detect.preprocess(jnp.asarray(img))
            out = detect.detect_markers(gray, table6, 6, params)
            found = {int(i) for i, ok in zip(out.ids, np.asarray(out.valid)) if ok}
            assert found == {mid}, (mid, nflip, found)
            strict = params._replace(error_correction_bits=0)
            out0 = detect.detect_markers(gray, table6, 6, strict)
            assert not np.asarray(out0.valid).any()

    def test_degraded_scene_recall_vs_cv(self, tmp_path):
        """JPEG-compressed + blurred scene: recall >= the cv2 detector (which
        also error-corrects), with zero false ids."""
        name = "DICT_6X6_250"
        cvd = cv.aruco.getPredefinedDictionary(cv.aruco.DICT_6X6_250)
        table6 = jnp.asarray(marker_bits_table(name))
        params = detect.resolve_error_correction(detect.DetectorParams(), name)

        img, gt = compose_scene(
            cvd,
            [(7, 96, (40, 60), 0), (42, 80, (200, 300), 1), (123, 64, (50, 330), 2),
             (200, 72, (220, 80), 3)],
        )
        img = cv.GaussianBlur(img, (0, 0), 1.0)
        ok_enc, buf = cv.imencode(".jpg", img, [cv.IMWRITE_JPEG_QUALITY, 40])
        assert ok_enc
        img = cv.imdecode(buf, cv.IMREAD_GRAYSCALE)

        out = detect.detect_markers(detect.preprocess(jnp.asarray(img)), table6, 6, params)
        ours = {int(i) for i, ok in zip(out.ids, np.asarray(out.valid)) if ok}

        params_cv = cv.aruco.DetectorParameters()
        params_cv.cornerRefinementMethod = cv.aruco.CORNER_REFINE_APRILTAG
        _, ids, _ = cv.aruco.ArucoDetector(cvd, params_cv).detectMarkers(img)
        cv_ids = set() if ids is None else set(ids.ravel().tolist())

        assert ours - set(gt) == set(), ours  # zero false ids
        assert len(ours) >= len(cv_ids & set(gt)), (ours, cv_ids)


class TestRecallVsOpenCV:
    def test_beats_cv_on_rendered_scene(self, table, cv_dict, tmp_path):
        """On oblique cube scenes the Otsu-majority decode must at least match
        OpenCV's detector recall with zero false ids (strict 0-bit matching)."""
        from vican_tpu.cam import Camera, estimate_pose_mp
        from vican_tpu.dataset import Dataset
        from vican_tpu.geometry import SE3, rodrigues
        from vican_tpu.render import look_at, make_cube_markers, render_dataset

        rng = np.random.default_rng(9)
        K = np.array([[420.0, 0, 320], [0, 420.0, 180], [0, 0, 1]])
        cams = {"0": Camera(id="0", intrinsics=K, distortion=np.zeros(12),
                            extrinsics=look_at((2.2, 0.3, 1.2), (0, 0, 1.0)),
                            resolution_x=640, resolution_y=360)}
        traj = {}
        for t in range(6):
            v = rng.normal(size=3)
            v = v / np.linalg.norm(v) * rng.uniform(0, np.pi)
            traj[str(t)] = SE3(R=rodrigues(v), t=np.array([0.0, 0.0, 1.0]))
        root = str(tmp_path / "scene")
        render_dataset(root, cams, traj, make_cube_markers(), marker_size=0.138)
        ds = Dataset(root)

        edges = estimate_pose_mp(
            im_filenames=ds.im_data["filename"], cams=ds.im_data["cam"],
            aruco=DICT, marker_size=0.138, corner_refine="CORNER_REFINE_APRILTAG",
            marker_ids=None, flags="SOLVEPNP_IPPE_SQUARE", brightness=0,
            contrast=0, batch_size=6, verbose=False,
        )
        ours_by_img = {}
        for (c, tm), v in edges.items():
            ours_by_img.setdefault(v["im_filename"], set()).add(int(tm.split("_")[1]))

        params_cv = cv.aruco.DetectorParameters()
        params_cv.cornerRefinementMethod = cv.aruco.CORNER_REFINE_APRILTAG
        det_cv = cv.aruco.ArucoDetector(cv_dict, params_cv)
        n_cv = n_ours = n_false = 0
        for fn in ds.im_data["filename"]:
            img = cv.imread(fn)
            _, ids, _ = det_cv.detectMarkers(img)
            cvids = set() if ids is None else {i for i in ids.ravel().tolist() if 0 <= i < 24}
            raw = ours_by_img.get(fn, set())
            inr = {i for i in raw if 0 <= i < 24}
            n_false += len(raw - inr)
            n_cv += len(cvids)
            n_ours += len(inr)
        assert n_false == 0
        assert n_ours >= n_cv, (n_ours, n_cv)

        # ground-truth-visibility recall: project each cube marker, keep the
        # front-facing (cos > 0.25), fully in-frame, >=120 px^2 ones, and
        # require >=90% of those detected (the second-chance central-half
        # decode pass recovers the 12-16 px markers: 42/44 on this scene)
        markers = make_cube_markers()
        ext_inv = cams["0"].extrinsics.inv()
        cam_pos = np.asarray(cams["0"].extrinsics.t(), float)
        s = 0.138
        pts = np.array([[-s/2, s/2, 0], [s/2, s/2, 0], [s/2, -s/2, 0], [-s/2, -s/2, 0]]).T
        n_vis = n_hit = 0
        for i, fn in enumerate(ds.im_data["filename"]):
            Tw = traj[str(ds.im_data["timestamp"][i])]
            ours = ours_by_img.get(fn, set())
            for mid, mpose in markers.items():
                Pw = (np.asarray(Tw.R(), float) @ (np.asarray(mpose.R(), float) @ pts
                      + np.asarray(mpose.t(), float)[:, None])
                      + np.asarray(Tw.t(), float)[:, None])
                Pc = (np.asarray(ext_inv.R(), float) @ Pw
                      + np.asarray(ext_inv.t(), float)[:, None])
                if (Pc[2] <= 0.05).any():
                    continue
                uv = (K @ (Pc / Pc[2]))[:2]
                if (uv[0].min() < 2 or uv[0].max() > 637
                        or uv[1].min() < 2 or uv[1].max() > 357):
                    continue
                n_w = np.asarray(Tw.R(), float) @ np.asarray(mpose.R(), float) @ np.array([0, 0, 1.0])
                c_w = np.asarray(Tw.R(), float) @ np.asarray(mpose.t(), float) + np.asarray(Tw.t(), float)
                d = cam_pos - c_w
                if n_w @ d / np.linalg.norm(d) <= 0.25:
                    continue
                x, y = uv
                area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
                if area < 120:
                    continue
                n_vis += 1
                n_hit += int(int(mid) in ours)
        assert n_vis >= 40  # scene sanity
        assert n_hit / n_vis >= 0.9, (n_hit, n_vis)


class TestLargeMarkers:
    def test_close_range_hollowed_rings(self, table, cv_dict):
        """Markers whose border ring is thicker than the largest adaptive-
        threshold window (33 px -> markers above ~250 px) hollow into thin
        square annuli; the outline-acceptance candidate gate must recover
        them (OpenCV's contour extraction does; our fill-ratio gate alone
        did not) — through BOTH the pure-device path and the production C
        quad extractor."""
        from vican_tpu.perception import host_candidates, host_preprocess

        for size in (300, 420):
            img = np.full((540, 720), 170, np.uint8)
            m = cv_dict.generateImageMarker(7, size)
            y, x = (540 - size) // 2, (720 - size) // 2
            img[y : y + size, x : x + size] = m
            params = detect.DetectorParams()
            params = detect.resolve_error_correction(params, DICT)
            gt = np.array([[x - 0.5, y - 0.5], [x + size - 0.5, y - 0.5],
                           [x + size - 0.5, y + size - 0.5], [x - 0.5, y + size - 0.5]])

            # pure-device path (extract_quads gates)
            det = detect.detect_markers(
                jnp.asarray(img, jnp.float32), table, 4, params
            )
            ok = np.asarray(det.valid)
            ids = np.asarray(det.ids)[ok]
            assert 7 in ids, (size, ids)
            corners = np.asarray(det.corners)[ok][list(ids).index(7)]
            err = min(np.abs(np.roll(gt, r, 0) - corners).max() for r in range(4))
            assert err < 1.0, (size, err)

            # production host/device-mode candidate path (C extractor +
            # perception._quad_gates): the outer-square quad must survive
            gray = host_preprocess(img[None], 0.0, 0.0)
            quads, valid, _ = host_candidates(gray, params)
            qv = quads[0][valid[0]]
            best = min(
                min(np.abs(np.roll(gt, r, 0) - q).max() for r in range(4))
                for q in qv
            )
            assert best < 3.0, (size, best)  # pre-refinement candidate


def test_packed_ccl_matches_unpacked():
    """quad_candidates_packed (bit-packed input) == quad_candidates on
    random masks, including non-multiple-of-8 widths."""
    import pytest as _pytest

    from vican_tpu._native import get_fastccl

    ccl = get_fastccl()
    if ccl is None:
        _pytest.skip("no C toolchain")
    rng = np.random.default_rng(5)
    for H, W in [(64, 96), (50, 70), (33, 41)]:
        fg = (rng.random((H, W)) < 0.25).astype(np.uint8)
        # add a solid square so at least one candidate passes min_area
        fg[10:30, 5:25] = 1
        Wb = -(-W // 8)
        packed = np.packbits(
            np.pad(fg, ((0, 0), (0, Wb * 8 - W))), axis=-1, bitorder="little"
        )
        c1, a1, n1 = ccl.quad_candidates(
            np.ascontiguousarray(fg), H, W, 16, 9.0, H * W * 0.9)
        c2, a2, n2 = ccl.quad_candidates_packed(
            np.ascontiguousarray(packed), H, W, Wb, 16, 9.0, H * W * 0.9)
        assert n1 == n2
        np.testing.assert_array_equal(np.frombuffer(c1, np.float32),
                                      np.frombuffer(c2, np.float32))
        np.testing.assert_array_equal(np.frombuffer(a1, np.int32),
                                      np.frombuffer(a2, np.int32))

"""PnP kernels vs the OpenCV oracle (projection, undistortion, IPPE, LM)."""
import numpy as np
import pytest

cv = pytest.importorskip("cv2")

import jax.numpy as jnp

from vican_tpu.ops import pnp

MARKER_SIZE = 0.276
K = np.array([[600.0, 0, 640], [0, 610.0, 360], [0, 0, 1]])
# a nontrivial 12-coefficient distortion (rational + thin prism)
DIST = np.array([0.12, -0.2, 1e-3, -2e-3, 0.05, 0.01, -0.02, 0.003, 1e-4, -1e-4, 2e-4, -5e-5])
OBJ = np.array([[-1, 1, 0], [1, 1, 0], [1, -1, 0], [-1, -1, 0]], np.float32) * MARKER_SIZE / 2


def random_poses(n, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    for _ in range(n):
        v = rng.normal(size=3) * 0.6
        R = cv.Rodrigues(v)[0]
        t = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.4, 0.4), rng.uniform(0.8, 4.0)])
        # keep the marker roughly facing the camera
        if (R @ np.array([0, 0, 1.0]))[2] > -0.1:
            R = R @ cv.Rodrigues(np.array([np.pi, 0, 0.0]))[0]
        poses.append((R, t))
    return poses


class TestProjection:
    def test_project_matches_cv(self):
        for R, t in random_poses(10, seed=1):
            ours = np.asarray(
                pnp.project_points(jnp.asarray(OBJ, jnp.float64), jnp.asarray(R), jnp.asarray(t),
                                   jnp.asarray(K), pnp.pad_distortion(jnp.asarray(DIST)))
            )
            theirs = cv.projectPoints(OBJ, cv.Rodrigues(R)[0], t, K, DIST)[0].squeeze()
            assert np.allclose(ours, theirs, atol=1e-6), np.abs(ours - theirs).max()

    def test_undistort_roundtrip(self):
        rng = np.random.default_rng(2)
        pts = rng.uniform([300, 200], [900, 600], size=(50, 2))
        dist = pnp.pad_distortion(jnp.asarray(DIST))
        xy = pnp.undistort_points(jnp.asarray(pts), jnp.asarray(K), dist)
        # redistort and compare
        xyd = np.asarray(pnp._distort(xy, dist))
        u = xyd[:, 0] * K[0, 0] + K[0, 2]
        v = xyd[:, 1] * K[1, 1] + K[1, 2]
        assert np.allclose(np.stack([u, v], 1), pts, atol=1e-6)

    def test_undistort_matches_cv(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform([300, 200], [900, 600], size=(20, 2)).astype(np.float64)
        ours = np.asarray(pnp.undistort_points(jnp.asarray(pts), jnp.asarray(K),
                                               pnp.pad_distortion(jnp.asarray(DIST))))
        theirs = cv.undistortPoints(pts.reshape(-1, 1, 2), K, DIST).squeeze()
        assert np.allclose(ours, theirs, atol=1e-6), np.abs(ours - theirs).max()


class TestIPPE:
    def test_exact_corners_recover_pose(self):
        for i, (R, t) in enumerate(random_poses(20, seed=4)):
            corners = cv.projectPoints(OBJ, cv.Rodrigues(R)[0], t, K, DIST)[0].squeeze()
            R_est, t_est, err2 = (np.asarray(x) for x in pnp.ippe_square(
                jnp.asarray(corners, jnp.float64), jnp.asarray(K),
                pnp.pad_distortion(jnp.asarray(DIST)), MARKER_SIZE))
            assert np.abs(t_est - t).max() < 1e-3, (i, t_est, t)
            assert np.abs(R_est - R).max() < 5e-3, (i, np.abs(R_est - R).max())

    def test_matches_cv_ippe_square(self):
        for i, (R, t) in enumerate(random_poses(20, seed=5)):
            corners = cv.projectPoints(OBJ, cv.Rodrigues(R)[0], t, K, DIST)[0].squeeze()
            flag, rvec, tvec = cv.solvePnP(OBJ, corners.astype(np.float32), K, DIST,
                                           flags=cv.SOLVEPNP_IPPE_SQUARE)
            assert flag
            R_cv = cv.Rodrigues(rvec)[0]
            R_est, t_est, _ = (np.asarray(x) for x in pnp.ippe_square(
                jnp.asarray(corners, jnp.float64), jnp.asarray(K),
                pnp.pad_distortion(jnp.asarray(DIST)), MARKER_SIZE))
            assert np.abs(t_est - tvec.ravel()).max() < 1e-3, i
            assert np.abs(R_est - R_cv).max() < 5e-3, i

    def test_noisy_corners_with_lm_match_cv_pipeline(self):
        rng = np.random.default_rng(6)
        for i, (R, t) in enumerate(random_poses(15, seed=7)):
            clean = cv.projectPoints(OBJ, cv.Rodrigues(R)[0], t, K, DIST)[0].squeeze()
            corners = clean + rng.normal(0, 0.3, size=(4, 2))
            # reference pipeline: IPPE + refineLM (cam.py:161-173)
            flag, rvec, tvec = cv.solvePnP(OBJ, corners.astype(np.float32), K, DIST,
                                           flags=cv.SOLVEPNP_IPPE_SQUARE)
            if not flag:
                continue
            rvec, tvec = cv.solvePnPRefineLM(OBJ, corners.astype(np.float32), K, DIST, rvec, tvec)
            R_cv = cv.Rodrigues(rvec)[0]
            R_est, t_est, err = (np.asarray(x) for x in pnp.solve_marker_pose(
                jnp.asarray(corners, jnp.float64), jnp.asarray(K),
                pnp.pad_distortion(jnp.asarray(DIST)), MARKER_SIZE))
            assert np.abs(t_est - tvec.ravel()).max() < 2e-3, (i, t_est, tvec.ravel())
            assert np.abs(R_est - R_cv).max() < 2e-2, (i, np.abs(R_est - R_cv).max())
            # reprojection error definition matches (max corner L2, cam.py:179)
            reproj = cv.projectPoints(OBJ, rvec, tvec, K, DIST)[0].squeeze()
            err_cv = np.linalg.norm(reproj - corners, axis=1).max()
            assert abs(err - err_cv) < 0.05, (err, err_cv)

    def test_iterative_matches_cv(self):
        """SOLVEPNP_ITERATIVE parity (VERDICT r2 item 6): the registry now
        honors the flag with a homography-init + LM solver; the reference
        accepts any flag string (vican/cam.py:161-165).  Compare against
        cv2's ITERATIVE + solvePnPRefineLM chain (the reference's exact
        pipeline with that flag)."""
        for i, (R, t) in enumerate(random_poses(20, seed=9)):
            corners = cv.projectPoints(OBJ, cv.Rodrigues(R)[0], t, K, DIST)[0].squeeze()
            flag, rvec, tvec = cv.solvePnP(OBJ, corners.astype(np.float32), K, DIST,
                                           flags=cv.SOLVEPNP_ITERATIVE)
            assert flag
            rvec, tvec = cv.solvePnPRefineLM(OBJ, corners.astype(np.float32), K, DIST,
                                             rvec, tvec)
            R_cv = cv.Rodrigues(rvec)[0]
            R_est, t_est, _ = (np.asarray(x) for x in pnp.solve_marker_pose(
                jnp.asarray(corners, jnp.float64), jnp.asarray(K),
                pnp.pad_distortion(jnp.asarray(DIST)), MARKER_SIZE,
                method="iterative"))
            assert np.abs(t_est - tvec.ravel()).max() < 2e-3, (i, t_est, tvec.ravel())
            assert np.abs(R_est - R_cv).max() < 1e-2, (i, np.abs(R_est - R_cv).max())

    def test_iterative_flag_through_perception_registry(self):
        """The flags string resolves to the iterative method (no silent
        IPPE substitution) and an unknown flag still raises."""
        from vican_tpu.utils.registry import PNP_FLAGS, resolve

        assert resolve(PNP_FLAGS, "SOLVEPNP_ITERATIVE", "flags") == "iterative"
        with pytest.raises(ValueError):
            resolve(PNP_FLAGS, "SOLVEPNP_EPNP", "flags")

    def test_vmapped_batch(self):
        import jax

        poses = random_poses(32, seed=8)
        corners = np.stack([
            cv.projectPoints(OBJ, cv.Rodrigues(R)[0], t, K, DIST)[0].squeeze()
            for R, t in poses
        ])
        f = jax.vmap(lambda c: pnp.solve_marker_pose(
            c, jnp.asarray(K), pnp.pad_distortion(jnp.asarray(DIST)), MARKER_SIZE))
        R_est, t_est, errs = f(jnp.asarray(corners, jnp.float64))
        t_gt = np.stack([t for _, t in poses])
        assert np.abs(np.asarray(t_est) - t_gt).max() < 1e-3
        assert np.asarray(errs).max() < 0.01

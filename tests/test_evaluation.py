"""Evaluation report, shoelace area, render GT-consistency, host-f64 fallback."""
import numpy as np
import pytest

from vican_tpu.cam import Camera
from vican_tpu.evaluation import evaluate_calibration, stats
from vican_tpu.geometry import SE3, rodrigues
from vican_tpu.ops.shoelace import polygon_area


class TestShoelace:
    def test_unit_square(self):
        sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
        assert np.isclose(polygon_area(sq), 1.0)
        # winding-independent
        assert np.isclose(polygon_area(sq[::-1]), 1.0)

    def test_batched_and_jnp(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        quads = rng.uniform(0, 100, size=(16, 4, 2))
        a_np = polygon_area(quads)
        a_j = np.asarray(polygon_area(jnp.asarray(quads)))
        np.testing.assert_allclose(a_np, a_j, rtol=1e-6)

    def test_matches_triangle_formula(self):
        tri = np.array([[0, 0], [4, 0], [0, 3]], float)
        assert np.isclose(polygon_area(tri), 6.0)


class TestEvaluation:
    def make_cams(self, n=6, seed=0):
        rng = np.random.default_rng(seed)
        cams = {}
        for i in range(n):
            v = rng.normal(size=3)
            cams[str(i)] = Camera(
                id=str(i), intrinsics=np.eye(3), distortion=np.zeros(12),
                extrinsics=SE3(R=rodrigues(v), t=rng.normal(size=3)),
                resolution_x=640, resolution_y=480,
            )
        return cams

    def test_perfect_estimates(self):
        cams = self.make_cams()
        est = {c: cams[c].extrinsics for c in cams}
        rep = evaluate_calibration(cams, est)
        assert rep.missing_cam_ids == []
        # SE3 composes through a float32 _pose (reference parity), which
        # arccos cancellation turns into ~0.01-0.04 deg on exact data
        assert rep.r_err_deg.max() < 0.05
        assert rep.t_err_cm.max() < 1e-3
        s = rep.summary()
        assert set(s) == {"missing", "SO3_deg", "E3_cm", "X_cm", "Y_cm", "Z_cm"}
        assert "SO(3)" in str(rep)

    def test_gauge_invariance(self):
        cams = self.make_cams(seed=1)
        g = SE3(R=rodrigues(np.array([0.3, -0.2, 0.5])), t=np.array([1.0, 2, 3]))
        # estimates in a different global frame: est = g @ gt, so that
        # est.inv() = gt.inv() @ g.inv() and cell 9's alignment model
        # (a ~ b @ gauge with a = gt.inv(), b = est.inv()) recovers gauge = g
        est = {c: g @ cams[c].extrinsics for c in cams}
        rep = evaluate_calibration(cams, est)
        assert rep.r_err_deg.max() < 0.05
        assert rep.t_err_cm.max() < 0.01

    def test_missing_and_empty(self):
        cams = self.make_cams(seed=2)
        est = {c: cams[c].extrinsics for c in list(cams)[:3]}
        rep = evaluate_calibration(cams, est)
        assert sorted(rep.missing_cam_ids) == sorted(list(cams)[3:])
        with pytest.raises(ValueError):
            evaluate_calibration(cams, {})

    def test_stats_shape(self):
        s = stats([1.0, 2.0, 3.0])
        assert s["min"] == 1.0 and s["max"] == 3.0 and s["median"] == 2.0


class TestHostFallback:
    def test_extreme_weights_resolved(self):
        """area**6-style weights (1e-6..1 after normalization) must yield
        accurate translations through the host-f64 fallback."""
        from vican_tpu import bipgo
        from vican_tpu.synthetic import make_problem

        prob = make_problem(seed=30, n_cams=6, n_times=60, n_markers=6,
                            kappa_r=1e7, sigma_t=1e-6)
        import jax

        # simulate the TPU condition: x64 off -> f64 request falls back
        jax.config.update("jax_enable_x64", False)
        try:
            with pytest.warns(UserWarning, match="float64 requested"):
                est = bipgo.bipartite_se3sync(
                    prob.edges, constraints=prob.constraints(),
                    noise_model_r=lambda e: 1.0,
                    # tutorial-style area**6: spans many orders of magnitude
                    noise_model_t=lambda e: 0.001 * polygon_area(e["corners"]) ** 6,
                    edge_filter=lambda e: True, maxiter=4,
                    dtype=np.float64, verbose=False,
                )
        finally:
            jax.config.update("jax_enable_x64", True)
        assert all(np.isfinite(p.pose()).all() for p in est.values())
        # with near-noiseless edges even extreme weights must recover GT
        from vican_tpu.geometry import optimize_gauge_SE3

        valid = [c for c in prob.cams_gt if c in est]
        G = optimize_gauge_SE3([prob.cams_gt[c].inv() for c in valid],
                               [est[c].inv() for c in valid])
        errs = [np.linalg.norm(prob.cams_gt[c].t() - (G.inv() @ est[c]).t()) for c in valid]
        assert np.mean(errs) < 0.01, errs

    def test_matches_device_f64(self):
        from vican_tpu import bipgo
        from vican_tpu.synthetic import make_problem

        prob = make_problem(seed=31, n_cams=6, n_times=50, n_markers=6,
                            kappa_r=1e6, sigma_t=1e-5)
        kwargs = dict(
            constraints=prob.constraints(), noise_model_r=lambda e: 1.0,
            noise_model_t=lambda e: 1.0, edge_filter=lambda e: True,
            maxiter=4, dtype=np.float64, verbose=False,
        )
        full_f64 = bipgo.bipartite_se3sync(prob.edges, **kwargs)

        import jax

        jax.config.update("jax_enable_x64", False)
        try:
            with pytest.warns(UserWarning):
                fallback = bipgo.bipartite_se3sync(prob.edges, **kwargs)
        finally:
            jax.config.update("jax_enable_x64", True)
        for k in full_f64:
            assert np.allclose(full_f64[k].t(), fallback[k].t(), atol=2e-4), k

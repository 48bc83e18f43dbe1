"""Solver tests: synthetic ground-truth recovery + parity vs the reference.

The reference implementation at /root/reference is importable (pure Python +
scipy); where present we use it as the parity oracle, running both solvers on
identical synthetic edge dicts and requiring agreement within the BASELINE
targets (1e-3 rad rotation / 1e-3 m translation).
"""
import os
import sys

import numpy as np
import pytest

from vican_tpu import bipgo
from vican_tpu.geometry import SE3, distance_SO3, optimize_gauge_SE3
from vican_tpu.synthetic import make_problem

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "vican"))


def gauge_aligned_errors(cams_gt: dict, pose_est: dict):
    """Reference evaluation protocol (main.ipynb cell 9)."""
    valid = [c for c in cams_gt if c in pose_est]
    G = optimize_gauge_SE3(
        [cams_gt[c].inv() for c in valid], [pose_est[c].inv() for c in valid]
    )
    r_err, t_err = [], []
    for c in valid:
        gt = cams_gt[c]
        est = G.inv() @ pose_est[c]
        r_err.append(distance_SO3(gt.R().astype(np.float64), est.R().astype(np.float64)))
        t_err.append(np.linalg.norm(gt.t() - est.t()))
    return np.array(r_err), np.array(t_err)


class TestRecovery:
    def test_camera_network_recovery(self):
        prob = make_problem(seed=0, n_cams=10, n_times=80, n_markers=8, kappa_r=1e5, sigma_t=1e-4)
        pose_est = bipgo.bipartite_se3sync(
            prob.edges,
            constraints=prob.constraints(),
            noise_model_r=lambda e: 1.0,
            noise_model_t=lambda e: 1.0,
            edge_filter=lambda e: True,
            maxiter=4,
            lsqr_solver="conjugate_gradient",
            dtype=np.float64,
            verbose=False,
        )
        r_err, t_err = gauge_aligned_errors(prob.cams_gt, pose_est)
        assert len(r_err) == 10
        assert r_err.mean() < 0.3, r_err  # degrees
        assert t_err.mean() < 0.01, t_err  # meters

    def test_low_noise_near_exact(self):
        prob = make_problem(seed=1, n_cams=6, n_times=50, n_markers=6, kappa_r=1e9, sigma_t=1e-8)
        pose_est = bipgo.bipartite_se3sync(
            prob.edges,
            constraints=prob.constraints(),
            noise_model_r=lambda e: 1.0,
            noise_model_t=lambda e: 1.0,
            edge_filter=lambda e: True,
            maxiter=4,
            dtype=np.float64,
            verbose=False,
        )
        r_err, t_err = gauge_aligned_errors(prob.cams_gt, pose_est)
        assert r_err.max() < 1e-2
        assert t_err.max() < 1e-4

    def test_object_calibration_recovery(self):
        # Single "camera" = per-frame observations of an 8-marker object.
        prob = make_problem(seed=2, n_cams=1, n_times=120, n_markers=8, p_obs=0.5,
                            kappa_r=1e6, sigma_t=1e-5)
        # object-calib edge schema: keys (t, "t_m") — cam.py naming from a
        # <t>/<t>.jpg cube_calib layout (README.md:51).
        obj_edges = {}
        for (c, tm), v in prob.edges.items():
            t, m = tm.split("_")
            obj_edges[(t, tm)] = v
        est = bipgo.object_bipartite_se3sync(
            obj_edges,
            noise_model_r=lambda e: 1.0,
            noise_model_t=lambda e: 1.0,
            edge_filter=lambda e: True,
            maxiter=4,
            dtype=np.float64,
            verbose=False,
        )
        assert set(est.keys()) == set(prob.markers_gt.keys())
        # Estimates are marker->root-marker-frame; GT markers are marker->object.
        # Align with the SE(3) gauge and compare.
        r_err, t_err = gauge_aligned_errors(prob.markers_gt, est)
        assert r_err.mean() < 0.05, r_err
        assert t_err.mean() < 1e-3, t_err

    def test_edge_filter_is_applied(self):
        prob = make_problem(seed=3, n_cams=6, n_times=40, n_markers=6, kappa_r=1e7, sigma_t=1e-6)
        # poison some edges but mark them filterable
        edges = dict(prob.edges)
        rng = np.random.default_rng(0)
        poisoned = list(edges.keys())[:: max(len(edges) // 17, 1)]
        for k in poisoned:
            v = dict(edges[k])
            v["pose"] = SE3(R=np.eye(3), t=rng.normal(size=3) * 100)
            v["reprojected_err"] = 99.0
            edges[k] = v
        pose_est = bipgo.bipartite_se3sync(
            edges,
            constraints=prob.constraints(),
            noise_model_r=lambda e: 1.0,
            noise_model_t=lambda e: 1.0,
            edge_filter=lambda e: e["reprojected_err"] < 0.05,
            maxiter=4,
            dtype=np.float64,
            verbose=False,
        )
        r_err, t_err = gauge_aligned_errors(prob.cams_gt, pose_est)
        assert r_err.mean() < 0.1
        assert t_err.mean() < 1e-3

    def test_noise_model_downweights_bad_edges(self):
        prob = make_problem(seed=4, n_cams=6, n_times=40, n_markers=6, kappa_r=1e7, sigma_t=1e-6)
        edges = {}
        rng = np.random.default_rng(1)
        for i, (k, v) in enumerate(prob.edges.items()):
            v = dict(v)
            if i % 7 == 0:
                v["pose"] = SE3(R=v["pose"].R() @ np.diag([1.0, -1, -1]), t=v["pose"].t() + rng.normal(size=3))
                v["quality"] = 1e-6
            else:
                v["quality"] = 1.0
            edges[k] = v
        pose_est = bipgo.bipartite_se3sync(
            edges,
            constraints=prob.constraints(),
            noise_model_r=lambda e: e["quality"],
            noise_model_t=lambda e: e["quality"],
            edge_filter=lambda e: True,
            maxiter=4,
            dtype=np.float64,
            verbose=False,
        )
        r_err, t_err = gauge_aligned_errors(prob.cams_gt, pose_est)
        assert r_err.mean() < 0.2, r_err
        assert t_err.mean() < 0.01, t_err

    def test_lsqr_direct_matches_cg(self):
        prob = make_problem(seed=5, n_cams=6, n_times=30, n_markers=5, kappa_r=1e6, sigma_t=1e-5)
        kwargs = dict(
            constraints=prob.constraints(),
            noise_model_r=lambda e: 1.0,
            noise_model_t=lambda e: 1.0,
            edge_filter=lambda e: True,
            maxiter=4,
            dtype=np.float64,
            verbose=False,
        )
        est_cg = bipgo.bipartite_se3sync(prob.edges, lsqr_solver="conjugate_gradient", **kwargs)
        est_dr = bipgo.bipartite_se3sync(prob.edges, lsqr_solver="direct", **kwargs)
        # translations agree up to a global shift (both are gauge-deficient LSQ)
        keys = sorted(est_cg.keys())
        d = np.stack([est_cg[k].t() - est_dr[k].t() for k in keys])
        spread = d - d.mean(axis=0)
        # CG runs at the reference's rtol=1e-5 on the normal equations, so the
        # two iterative solutions agree to ~1e-4 m, not machine precision.
        assert np.abs(spread).max() < 1e-3, np.abs(spread).max()

    def test_single_timestep_network(self):
        """Snapshot calibration: many cameras, ONE timestep (T = 1) — the
        power-graph/time-dual shapes at their lower boundary."""
        prob = make_problem(seed=30, n_cams=6, n_times=1, n_markers=8,
                            p_obs=1.0, kappa_r=1e6, sigma_t=1e-5)
        est = bipgo.bipartite_se3sync(
            prob.edges,
            constraints=prob.constraints(),
            noise_model_r=lambda e: 1.0,
            noise_model_t=lambda e: 1.0,
            edge_filter=lambda e: True,
            maxiter=4,
            dtype=np.float64,
            verbose=False,
        )
        r_err, t_err = gauge_aligned_errors(prob.cams_gt, est)
        assert len(r_err) == 6
        assert r_err.mean() < 0.5, r_err
        assert t_err.mean() < 0.02, t_err

    def test_empty_after_filter_raises(self):
        prob = make_problem(seed=6, n_cams=3, n_times=10, n_markers=4)
        with pytest.raises(ValueError):
            bipgo.bipartite_se3sync(
                prob.edges,
                constraints=prob.constraints(),
                noise_model_r=lambda e: 1.0,
                noise_model_t=lambda e: 1.0,
                edge_filter=lambda e: False,
                maxiter=4,
                verbose=False,
            )


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkout not available")
class TestReferenceParity:
    """Run the actual reference implementation (read-only import) as oracle."""

    @classmethod
    def setup_class(cls):
        sys.path.insert(0, REFERENCE)
        import vican.bipgo as ref_bipgo  # noqa
        import vican.geometry as ref_geometry  # noqa

        cls.ref_bipgo = ref_bipgo
        cls.ref_geometry = ref_geometry

    def to_ref_edges(self, edges):
        RefSE3 = self.ref_geometry.SE3
        out = {}
        for k, v in edges.items():
            nv = dict(v)
            nv["pose"] = RefSE3(R=np.array(v["pose"].R(), dtype=np.float64),
                                t=np.array(v["pose"].t(), dtype=np.float64))
            out[k] = nv
        return out

    def to_ref_constraints(self, constraints):
        RefSE3 = self.ref_geometry.SE3
        return {
            m: RefSE3(R=np.array(c.R(), dtype=np.float64), t=np.array(c.t(), dtype=np.float64))
            for m, c in constraints.items()
        }

    def test_se3sync_parity(self):
        prob = make_problem(seed=7, n_cams=8, n_times=60, n_markers=6, p_obs=0.4,
                            kappa_r=1e4, sigma_t=1e-3)
        nm_r = lambda e: 1.0 + 0.001 * e["corners"][0, 0]
        nm_t = lambda e: 0.5 + 0.001 * e["corners"][0, 1]
        filt = lambda e: e["reprojected_err"] < 0.03

        ours = bipgo.bipartite_se3sync(
            prob.edges, constraints=prob.constraints(),
            noise_model_r=nm_r, noise_model_t=nm_t, edge_filter=filt,
            maxiter=4, lsqr_solver="conjugate_gradient", dtype=np.float64, verbose=False,
        )
        theirs = self.ref_bipgo.bipartite_se3sync(
            self.to_ref_edges(prob.edges),
            constraints=self.to_ref_constraints(prob.constraints()),
            noise_model_r=nm_r, noise_model_t=nm_t, edge_filter=filt,
            maxiter=4, lsqr_solver="conjugate_gradient", dtype=np.float64,
        )

        assert set(ours.keys()) == set(theirs.keys())
        r_errs, t_errs = [], []
        for k in theirs:
            r_errs.append(distance_SO3(np.asarray(ours[k].R(), np.float64),
                                       np.asarray(theirs[k].R(), np.float64)))
            t_errs.append(np.linalg.norm(ours[k].t() - theirs[k].t()))
        r_errs, t_errs = np.array(r_errs), np.array(t_errs)
        # BASELINE targets: 1e-3 rad (0.057 deg) rotation, 1e-3 m translation.
        assert r_errs.max() < 0.057, (r_errs.max(), r_errs.mean())
        # translations match up to the (unpinned) global shift both solvers share
        # through CG from x0=0; compare directly like the baseline requires.
        assert t_errs.max() < 1e-3, (t_errs.max(), t_errs.mean())

    def test_object_se3sync_parity(self):
        prob = make_problem(seed=8, n_cams=1, n_times=100, n_markers=8, p_obs=0.5,
                            kappa_r=1e5, sigma_t=1e-4)
        obj_edges = {(tm.split("_")[0], tm): v for (c, tm), v in prob.edges.items()}
        nm_r = lambda e: 1.0
        nm_t = lambda e: 1.0
        filt = lambda e: True

        ours = bipgo.object_bipartite_se3sync(
            obj_edges, noise_model_r=nm_r, noise_model_t=nm_t, edge_filter=filt,
            maxiter=4, lsqr_solver="conjugate_gradient", dtype=np.float64, verbose=False,
        )
        theirs = self.ref_bipgo.object_bipartite_se3sync(
            self.to_ref_edges(obj_edges), noise_model_r=nm_r, noise_model_t=nm_t,
            edge_filter=filt, maxiter=4, lsqr_solver="conjugate_gradient", dtype=np.float64,
        )
        assert set(ours.keys()) == set(theirs.keys())
        for k in theirs:
            assert distance_SO3(np.asarray(ours[k].R(), np.float64),
                                np.asarray(theirs[k].R(), np.float64)) < 0.057
            assert np.linalg.norm(ours[k].t() - theirs[k].t()) < 1e-3

    def test_small_so3sync_parity(self):
        """The faithful small-graph variant vs the reference's own
        ``bipartite_so3sync`` (vican/bipgo.py:18-142): same folding
        convention, node order, gauge, and (untransposed) output frame."""
        import contextlib
        import io

        prob = make_problem(seed=11, n_cams=5, n_times=24, n_markers=5,
                            p_obs=0.8, kappa_r=1e5, sigma_t=1e-4)
        nm = lambda e: 1.0 + 0.001 * e["corners"][0, 0]
        filt = lambda e: True
        ours = bipgo.bipartite_so3sync(
            prob.edges, constraints=prob.constraints(), noise_model=nm,
            edge_filter=filt, maxiter=4, dtype=np.float64, verbose=False,
        )
        with contextlib.redirect_stdout(io.StringIO()):
            theirs = self.ref_bipgo.bipartite_so3sync(
                self.to_ref_edges(prob.edges),
                constraints=self.to_ref_constraints(prob.constraints()),
                noise_model=nm, edge_filter=filt, maxiter=4, dtype=np.float64,
            )
        assert set(ours.keys()) == set(theirs.keys())
        for k in theirs:
            assert distance_SO3(np.asarray(ours[k], np.float64),
                                np.asarray(theirs[k], np.float64)) < 0.057, k

    def test_se3sync_f32_wire_parity(self):
        """Dict-API ``dtype=float32`` run — which routes through the int16-quat
        wire program (``core.se3sync_wire``, the TPU production path) — against
        the reference at the BASELINE budget (VERDICT r2 item 3: the f64
        parity tests above take the host-f64 translation route instead).

        Well-conditioned fixture (high kappa, dense observations) so the
        maxiter=4 iterate is converged and implementation-level f32 rounding
        differences stay below the 0.057 deg / 1e-3 m budget.
        """
        import jax

        prob = make_problem(seed=12, n_cams=8, n_times=60, n_markers=6, p_obs=0.7,
                            kappa_r=1e6, sigma_t=1e-4)
        nm_r = lambda e: 1.0 + 0.001 * e["corners"][0, 0]
        nm_t = lambda e: 0.5 + 0.001 * e["corners"][0, 1]
        filt = lambda e: e["reprojected_err"] < 0.035

        ours = bipgo.bipartite_se3sync(
            prob.edges, constraints=prob.constraints(),
            noise_model_r=nm_r, noise_model_t=nm_t, edge_filter=filt,
            maxiter=4, lsqr_solver="conjugate_gradient", dtype=np.float32, verbose=False,
        )
        theirs = self.ref_bipgo.bipartite_se3sync(
            self.to_ref_edges(prob.edges),
            constraints=self.to_ref_constraints(prob.constraints()),
            noise_model_r=nm_r, noise_model_t=nm_t, edge_filter=filt,
            maxiter=4, lsqr_solver="conjugate_gradient", dtype=np.float32,
        )

        assert set(ours.keys()) == set(theirs.keys())
        r_errs, t_errs = [], []
        for k in theirs:
            r_errs.append(distance_SO3(np.asarray(ours[k].R(), np.float64),
                                       np.asarray(theirs[k].R(), np.float64)))
            t_errs.append(np.linalg.norm(np.asarray(ours[k].t(), np.float64)
                                         - np.asarray(theirs[k].t(), np.float64)))
        r_errs, t_errs = np.array(r_errs), np.array(t_errs)
        # BASELINE budget, same as the f64 parity test: both solvers share
        # the gauge (anchored to block 0 / CG from x0 = 0), so compare raw.
        assert r_errs.max() < 0.057, (r_errs.max(), r_errs.mean())
        assert t_errs.max() < 1e-3, (t_errs.max(), t_errs.mean())

    def test_so3sync_parity(self):
        prob = make_problem(seed=9, n_cams=8, n_times=50, n_markers=6, kappa_r=1e4)
        nm = lambda e: 1.0
        filt = lambda e: True
        ours = bipgo.large_bipartite_so3sync(
            prob.edges, constraints=prob.constraints(), noise_model=nm,
            edge_filter=filt, maxiter=4, dtype=np.float64, verbose=False,
        )
        theirs = self.ref_bipgo.large_bipartite_so3sync(
            self.to_ref_edges(prob.edges), constraints=self.to_ref_constraints(prob.constraints()),
            noise_model=nm, edge_filter=filt, maxiter=4, dtype=np.float64,
        )
        assert set(ours.keys()) == set(theirs.keys())
        for k in theirs:
            assert distance_SO3(np.asarray(ours[k], np.float64),
                                np.asarray(theirs[k], np.float64)) < 0.057


def test_wire_format_matches_fused():
    """The 32-byte/edge wire entry (int16 quats + bit-packed ids) matches
    the plain fused entry within quantization noise (~4e-5 rad)."""
    import jax.numpy as jnp

    from vican_tpu.ops.lie import distance_so3
    from vican_tpu.solver import core, pack_problem
    from vican_tpu.synthetic import make_problem

    prob = make_problem(seed=5, n_cams=8, n_times=60, n_markers=6, kappa_r=1e5)
    p = pack_problem(prob.edges, prob.constraints(), lambda e: 1.0, lambda e: 1.0,
                     lambda e: True, dtype=np.float32)
    C, T = p.num_cams, p.num_times
    M = len(p.marker_ids)
    mb = max((M - 1).bit_length(), 1)
    tb = max((T - 1).bit_length(), 1)
    kw = dict(root_idx=p.root_idx, C=C, T=T, maxiter=jnp.asarray(4, jnp.int32))
    Rc = jnp.asarray(p.R_con, np.float32)
    tc = jnp.asarray(p.t_con, np.float32)

    _, out_f = core.se3sync_fused(jnp.asarray(p.edata, np.float32),
                                  jnp.asarray(p.eidx), Rc, tc, **kw)
    wire = np.empty((p.num_edges, 8), np.float32)
    qi = np.clip(np.round(np.ascontiguousarray(p.edata[:, :4]) * 32767.0),
                 -32767, 32767).astype(np.int16)
    wire[:, 0:2] = qi.view(np.float32)
    wire[:, 2:7] = p.edata[:, 4:9]
    iv = ((p.eidx[:, 0].astype(np.int64) << (tb + mb))
          | (p.eidx[:, 1].astype(np.int64) << mb)
          | p.eidx[:, 2]).astype(np.int32)
    wire[:, 7] = iv.view(np.float32)
    con = np.concatenate([p.R_con.reshape(M, 9), p.t_con], axis=1).astype(np.float32)
    _, out_w = core.se3sync_wire(jnp.asarray(wire), jnp.asarray(con), **kw)

    N = C + T
    of, ow = np.asarray(out_f), np.asarray(out_w)
    d = np.asarray(distance_so3(of[:N, :9].reshape(N, 3, 3).astype(np.float64),
                                ow[:N, :9].reshape(N, 3, 3).astype(np.float64)))
    # the not-fully-converged primal-dual iterate (maxiter=4) amplifies the
    # ~4e-5 rad quantization delta on this small noisy fixture; the tight
    # reference-budget comparison of the wire path lives in
    # TestReferenceParity.test_se3sync_f32_wire_parity (converged fixture)
    assert d.max() < 0.2, d.max()  # degrees
    assert np.abs(of[:N, 9:] - ow[:N, 9:]).max() < 5e-3


class TestWireV2:
    """The 24-byte/edge wire (int16 translations + log-int16 weights)."""

    def _packed(self, nm_r=None, nm_t=None, seed=5):
        from vican_tpu.solver import pack_problem
        from vican_tpu.synthetic import make_problem

        prob = make_problem(seed=seed, n_cams=8, n_times=60, n_markers=6,
                            kappa_r=1e5)
        return pack_problem(
            prob.edges, prob.constraints(),
            nm_r or (lambda e: 1.0), nm_t or (lambda e: 1.0),
            lambda e: True, dtype=np.float32,
        )

    def test_decode_roundtrip(self):
        """Device decode of the v2 wire reproduces the packed arrays to
        quantization spec: t within t_scale/2, weights within c/2 relative —
        stressed with an areas^6-scale weight spread (log range ~ e^13)."""
        import jax.numpy as jnp
        from jax import lax

        from vican_tpu import bipgo as bg

        # weight spread comparable to the tutorial's area**6 models
        nm_r = lambda e: float(np.exp(-13.0 * abs(np.sin(e["corners"][0, 0]))))
        nm_t = lambda e: float(np.exp(-10.0 * abs(np.cos(e["corners"][0, 1]))))
        p = self._packed(nm_r, nm_t)
        out = bg.pack_wire_v2(p)
        assert out is not None
        wire, con, scales = out
        assert wire.shape == (p.num_edges, 6) and wire.dtype == np.float32
        E = p.num_edges
        ti = lax.bitcast_convert_type(jnp.asarray(wire[:, 2:4]), jnp.int16)
        t_dec = np.asarray(ti).reshape(E, 4)[:, :3].astype(np.float64) * scales[0]
        # 0.5 counts of round-off + ~4e-3 counts from the f32 t*(1/scale)
        assert np.abs(t_dec - p.t_e).max() <= 0.51 * scales[0]
        ki = np.asarray(
            lax.bitcast_convert_type(jnp.asarray(wire[:, 4]), jnp.int16)
        ).astype(np.float64)
        k_dec = np.exp(-ki * np.asarray([scales[1], scales[2]], np.float64))
        rel = np.abs(k_dec / p.edata[:, 7:9].astype(np.float64) - 1.0)
        for j, cj in enumerate((scales[1], scales[2])):
            assert rel[:, j].max() <= 0.5001 * float(cj) + 1e-7, (j, rel[:, j].max())

    def test_v2_matches_v1_solve(self):
        """Full solve through the v2 wire agrees with the v1 wire within the
        added quantization noise (well under the reference-parity budget)."""
        import jax.numpy as jnp

        from vican_tpu import bipgo as bg
        from vican_tpu.ops.lie import distance_so3
        from vican_tpu.solver import core

        nm_r = lambda e: float(np.exp(-6.0 * abs(np.sin(e["corners"][0, 0]))))
        p = self._packed(nm_r)
        kw = dict(root_idx=p.root_idx, C=p.num_cams, T=p.num_times,
                  maxiter=jnp.asarray(4, jnp.int32))
        w1, c1 = bg.pack_wire(p)
        _, out1 = core.se3sync_wire(jnp.asarray(w1), jnp.asarray(c1), **kw)
        w2, c2, s2 = bg.pack_wire_v2(p)
        _, out2 = core.se3sync_wire2(
            jnp.asarray(w2), jnp.asarray(c2), jnp.asarray(s2), **kw
        )
        N = p.num_cams + p.num_times
        o1, o2 = np.asarray(out1), np.asarray(out2)
        d = np.asarray(distance_so3(o1[:N, :9].reshape(N, 3, 3).astype(np.float64),
                                    o2[:N, :9].reshape(N, 3, 3).astype(np.float64)))
        assert d.max() < 0.05, d.max()  # degrees
        assert np.abs(o1[:N, 9:] - o2[:N, 9:]).max() < 5e-4

    def test_fallbacks(self):
        """Problems the v2 wire can't carry exactly route back to v1."""
        from vican_tpu import bipgo as bg

        # ultra-wide weight range: log step would exceed the 1e-3 rel cap
        nm_r = lambda e: float(np.exp(-40.0 * abs(np.sin(e["corners"][0, 0]))))
        p = self._packed(nm_r)
        assert bg.pack_wire_v2(p) is None
        assert bg.pack_wire(p) is not None  # v1 still fits

        # non-positive weight (edge case a user callable could produce)
        p2 = self._packed()
        p2.edata[0, 7] = 0.0
        assert bg.pack_wire_v2(p2) is None

    def test_dict_api_routes_v2(self, monkeypatch):
        """The f32 dict API takes the v2 wire by default and honors the
        VICAN_TPU_WIRE=v1 escape hatch (same poses either way)."""
        from vican_tpu import bipgo as bg
        from vican_tpu.synthetic import make_problem

        prob = make_problem(seed=7, n_cams=6, n_times=40, n_markers=6,
                            kappa_r=1e6, sigma_t=1e-4)
        seen = []
        orig = bg.pack_wire_v2
        monkeypatch.setattr(
            bg, "pack_wire_v2", lambda p: seen.append(1) or orig(p)
        )
        kw = dict(constraints=prob.constraints(), noise_model_r=lambda e: 1.0,
                  noise_model_t=lambda e: 1.0, edge_filter=lambda e: True,
                  maxiter=4, lsqr_solver="conjugate_gradient",
                  dtype=np.float32, verbose=False)
        ours2 = bg.bipartite_se3sync(prob.edges, **kw)
        assert seen, "dict API did not route through pack_wire_v2"
        monkeypatch.setenv("VICAN_TPU_WIRE", "v1")
        ours1 = bg.bipartite_se3sync(prob.edges, **kw)
        for k in ours1:
            assert np.linalg.norm(np.asarray(ours1[k].t(), np.float64)
                                  - np.asarray(ours2[k].t(), np.float64)) < 5e-4


def test_dense_cg_matvec_matches_scatter():
    """The dense (C, T)-adjacency A^T A matvec == the per-edge scatter
    formulation (the >budget fallback) on random weighted graphs."""
    import jax.numpy as jnp

    from vican_tpu.solver import core

    rng = np.random.default_rng(21)
    C, T, E = 13, 37, 400
    cam = jnp.asarray(rng.integers(0, C, E), jnp.int32)
    tim = jnp.asarray(rng.integers(0, T, E), jnp.int32)
    k2 = jnp.asarray(rng.uniform(0.1, 2.0, E), jnp.float32)
    x = jnp.asarray(rng.normal(size=(C + T, 3)), jnp.float32)
    dense = core._make_normal_mv(k2, cam, tim, C, T, jnp.float32)(x)
    scatter = core._normal_matvec(x, k2, cam, tim, C, T)
    assert np.allclose(np.asarray(dense), np.asarray(scatter), atol=1e-4)

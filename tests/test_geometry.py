"""Geometry core: host API parity + device batched ops."""
import numpy as np
import jax
import jax.numpy as jnp

from vican_tpu import geometry as G
from vican_tpu.ops import lie


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


class TestHostGeometry:
    def test_rot_axes(self):
        for f, axis in [(G.rotx, 0), (G.roty, 1), (G.rotz, 2)]:
            R = f(0.3).astype(np.float64)
            assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
            assert np.isclose(np.linalg.det(R), 1.0, atol=1e-6)
            e = np.zeros(3)
            e[axis] = 1.0
            assert np.allclose(R @ e, e, atol=1e-6)
            assert np.isclose(G.angle(R), np.degrees(0.3), atol=1e-4)

    def test_rad_deg_roundtrip(self):
        assert np.isclose(G.deg2rad(G.rad2deg(0.7)), 0.7)

    def test_rodrigues_vs_closed_form(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            v = rng.normal(size=3)
            R = G.rodrigues(v)
            assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
            theta = np.linalg.norm(v)
            assert np.isclose(G.angle(R), np.degrees(theta % (2 * np.pi)), atol=1e-6) or np.isclose(
                G.angle(R), 360 - np.degrees(theta % (2 * np.pi)), atol=1e-6
            )
            # axis is fixed
            assert np.allclose(R @ (v / theta), v / theta, atol=1e-10)

    def test_project_so3(self):
        rng = np.random.default_rng(1)
        R = random_rotation(rng)
        noisy = R + 0.05 * rng.normal(size=(3, 3))
        P = G.project_SO3(noisy)
        assert np.allclose(P @ P.T, np.eye(3), atol=1e-10)
        assert np.isclose(np.linalg.det(P), 1.0, atol=1e-10)
        assert G.distance_SO3(P, R) < 5.0
        # projection of a reflection-ish matrix still lands on SO(3)
        P2 = G.project_SO3(np.diag([1.0, 1.0, -1.0]))
        assert np.isclose(np.linalg.det(P2), 1.0, atol=1e-10)

    def test_se3_semantics(self):
        rng = np.random.default_rng(2)
        R, t = random_rotation(rng), rng.normal(size=3)
        T = G.SE3(R=R, t=t)
        assert np.allclose(T.R(), R)
        assert np.allclose(T.t(), t)
        I = T @ T.inv()
        assert np.allclose(I.pose(), np.eye(4), atol=1e-6)
        x = rng.normal(size=(3, 5))
        assert np.allclose(T.apply(x), R @ x + t[:, None], atol=1e-6)
        # pose= ctor casts to float32 (reference geometry.py:209)
        T2 = G.SE3(pose=np.eye(4, dtype=np.float64))
        assert T2.pose().dtype == np.float32

    def test_langevin_concentration(self):
        np.random.seed(0)
        tight = [G.angle(G.langevin(500.0)) for _ in range(50)]
        loose = [G.angle(G.langevin(1.0)) for _ in range(50)]
        assert np.mean(tight) < np.mean(loose)
        assert np.mean(tight) < 5.0

    def test_gauge_so3_exact(self):
        rng = np.random.default_rng(3)
        g = random_rotation(rng)
        bs = [random_rotation(rng) for _ in range(10)]
        as_ = [b @ g for b in bs]
        g_est = G.optimize_gauge_SO3(as_, bs)
        assert np.allclose(g_est, g, atol=1e-8)

    def test_gauge_se3_exact(self):
        rng = np.random.default_rng(4)
        gR, gt = random_rotation(rng), rng.normal(size=3)
        gauge = G.SE3(R=gR, t=gt)
        bs = [G.SE3(R=random_rotation(rng), t=rng.normal(size=3)) for _ in range(10)]
        as_ = [b @ gauge for b in bs]
        g_est = G.optimize_gauge_SE3(as_, bs)
        assert np.allclose(g_est.R(), gR, atol=1e-8)
        assert np.allclose(g_est.t(), gt, atol=1e-8)


class TestDeviceLie:
    def test_rodrigues_batched_matches_host(self):
        rng = np.random.default_rng(5)
        v = rng.normal(size=(32, 3))
        v[0] = 0.0  # zero-angle guard
        v[1] = [np.pi, 0, 0]  # pi rotation
        R_dev = np.asarray(lie.rodrigues(jnp.asarray(v)))
        for i in range(len(v)):
            assert np.allclose(R_dev[i], G.rodrigues(v[i]), atol=1e-6), i

    def test_log_exp_roundtrip(self):
        rng = np.random.default_rng(6)
        v = rng.normal(size=(64, 3))
        # keep |v| < pi for uniqueness
        v = v / np.linalg.norm(v, axis=1, keepdims=True) * rng.uniform(0, 3.1, size=(64, 1))
        v[0] = 0.0
        R = lie.rodrigues(jnp.asarray(v))
        v_back = np.asarray(lie.so3_log(R))
        assert np.allclose(v_back, v, atol=1e-5)

    def test_log_near_pi(self):
        rng = np.random.default_rng(7)
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        v = axis * (np.pi - 1e-8)
        R = lie.rodrigues(jnp.asarray(v[None]))
        v_back = np.asarray(lie.so3_log(R))[0]
        assert np.isclose(abs(np.linalg.norm(v_back)), np.pi, atol=1e-5)
        assert np.allclose(np.abs(v_back / np.pi), np.abs(axis), atol=1e-4)

    def test_project_so3_batched(self):
        rng = np.random.default_rng(8)
        X = rng.normal(size=(16, 3, 3))
        P = np.asarray(lie.project_so3(jnp.asarray(X)))
        for i in range(16):
            assert np.allclose(P[i], G.project_SO3(X[i]), atol=1e-8)

    def test_se3_ops(self):
        rng = np.random.default_rng(9)
        Ra = np.stack([random_rotation(rng) for _ in range(8)])
        Rb = np.stack([random_rotation(rng) for _ in range(8)])
        ta, tb = rng.normal(size=(8, 3)), rng.normal(size=(8, 3))
        Rc, tc = lie.se3_compose(jnp.asarray(Ra), jnp.asarray(ta), jnp.asarray(Rb), jnp.asarray(tb))
        Ri, ti = lie.se3_inverse(Rc, tc)
        Rid, tid = lie.se3_compose(Ri, ti, Rc, tc)
        assert np.allclose(np.asarray(Rid), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-8)
        assert np.allclose(np.asarray(tid), 0.0, atol=1e-8)

    def test_distance_so3(self):
        rng = np.random.default_rng(10)
        R1 = np.stack([random_rotation(rng) for _ in range(4)])
        R2 = np.stack([random_rotation(rng) for _ in range(4)])
        d = np.asarray(lie.distance_so3(jnp.asarray(R1), jnp.asarray(R2)))
        for i in range(4):
            assert np.isclose(d[i], G.distance_SO3(R1[i], R2[i]), atol=1e-5)

    def test_random_langevin(self):
        key = jax.random.PRNGKey(0)
        R = lie.random_langevin(key, 200.0, (256,))
        R = np.asarray(R)
        # valid rotations
        assert np.allclose(R @ np.swapaxes(R, 1, 2), np.eye(3), atol=1e-5)
        angles = np.asarray(lie.angle_deg(jnp.asarray(R)))
        R_loose = np.asarray(lie.random_langevin(jax.random.PRNGKey(1), 2.0, (256,)))
        angles_loose = np.asarray(lie.angle_deg(jnp.asarray(R_loose)))
        assert angles.mean() < angles_loose.mean()

    def test_gauge_procrustes_batched(self):
        rng = np.random.default_rng(11)
        g = random_rotation(rng)
        gt = rng.normal(size=3)
        Rb = np.stack([random_rotation(rng) for _ in range(12)])
        tb = rng.normal(size=(12, 3))
        Ra = Rb @ g
        ta = np.einsum("nij,j->ni", Rb, gt) + tb
        gR, gT = lie.gauge_procrustes_se3(jnp.asarray(Ra), jnp.asarray(ta), jnp.asarray(Rb), jnp.asarray(tb))
        assert np.allclose(np.asarray(gR), g, atol=1e-8)
        assert np.allclose(np.asarray(gT), gt, atol=1e-8)

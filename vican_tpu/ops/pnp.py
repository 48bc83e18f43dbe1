"""Batched camera model + planar-square PnP on device.

Replaces the reference's per-marker OpenCV calls (vican/cam.py:161-179) with
vmapped jnp kernels:

- :func:`project_points`   <- cv.projectPoints (full 12-coefficient rational
                              + thin-prism distortion model, cam.py:31-32)
- :func:`undistort_points` <- cv.undistortPoints (fixed-point iteration)
- :func:`ippe_square`      <- cv.solvePnP(flags=SOLVEPNP_IPPE_SQUARE)
                              (Collins & Bartoli IPPE: closed-form planar pose
                              with the two-fold ambiguity resolved by
                              reprojection error)
- :func:`refine_lm`        <- cv.solvePnPRefineLM (Levenberg-Marquardt on the
                              6-DoF pose, autodiff Jacobian)
- :func:`reprojection_error_max` <- max per-corner L2 (cam.py:176-179)

All functions take a single marker/camera and arbitrary batching comes from
``jax.vmap`` (see :mod:`vican_tpu.perception`).  Distortion vectors of any
length up to 14 are zero-padded to (k1,k2,p1,p2,k3,k4,k5,k6,s1..s4,taux,tauy);
the tilt terms (taux/tauy) are not modeled (the datasets use 12 coefficients,
all zero in the rendered data — render.py:293).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "marker_object_points",
    "pad_distortion",
    "project_points",
    "undistort_points",
    "homography_4pt",
    "ippe_square",
    "iterative_planar",
    "refine_lm",
    "reprojection_error_max",
    "solve_marker_pose",
]


def marker_object_points(marker_size, dtype=jnp.float32):
    """Square marker corners in the marker frame, TL,TR,BR,BL order
    (cam.py:149-153)."""
    pts = jnp.array(
        [[-1, 1, 0], [1, 1, 0], [1, -1, 0], [-1, -1, 0]], dtype=dtype
    )
    return pts * (marker_size * 0.5)


def pad_distortion(dist):
    """Zero-pad a distortion vector to 14 coefficients."""
    dist = jnp.atleast_1d(jnp.asarray(dist))
    return jnp.zeros((14,), dist.dtype).at[: dist.shape[0]].set(dist[:14])


def _distort(xy, dist):
    """Apply the OpenCV distortion model to ideal normalized coords (..., 2)."""
    k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4 = (dist[i] for i in range(12))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = (1.0 + k1 * r2 + k2 * r4 + k3 * r6) / (1.0 + k4 * r2 + k5 * r4 + k6 * r6)
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x) + s1 * r2 + s2 * r4
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y + s3 * r2 + s4 * r4
    return jnp.stack([xd, yd], axis=-1)


def project_points(pts, R, t, K, dist):
    """Project 3D points (..., 3) through pose (R, t) and camera (K, dist).

    Returns pixel coordinates (..., 2).  Matches cv.projectPoints for the
    12-coefficient model.
    """
    pc = jnp.einsum("ij,...j->...i", R, pts) + t
    xy = pc[..., :2] / pc[..., 2:3]
    xyd = _distort(xy, dist)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([fx * xyd[..., 0] + cx, fy * xyd[..., 1] + cy], axis=-1)


def undistort_points(pts_px, K, dist, iters: int = 8):
    """Pixel coords (..., 2) -> ideal normalized coords (cv.undistortPoints).

    Fixed-point iteration: start from the distorted normalized coords and
    repeatedly divide out the radial factor / subtract tangential terms.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    xd = (pts_px[..., 0] - cx) / fx
    yd = (pts_px[..., 1] - cy) / fy
    target = jnp.stack([xd, yd], axis=-1)

    k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4 = (dist[i] for i in range(12))

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        r4 = r2 * r2
        r6 = r4 * r2
        radial = (1.0 + k1 * r2 + k2 * r4 + k3 * r6) / (1.0 + k4 * r2 + k5 * r4 + k6 * r6)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x) + s1 * r2 + s2 * r4
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y + s3 * r2 + s4 * r4
        xn = (target[..., 0] - dx) / radial
        yn = (target[..., 1] - dy) / radial
        return jnp.stack([xn, yn], axis=-1)

    return lax.fori_loop(0, iters, body, target)


def homography_4pt(src, dst):
    """Homography mapping 4 source points to 4 destination points (DLT).

    ``src``/``dst``: (4, 2).  Returns (3, 3) with H[2,2] = 1.
    """
    def rows(s, d):
        x, y = s
        u, v = d
        r1 = jnp.array([x, y, 1.0, 0.0, 0.0, 0.0, -u * x, -u * y])
        r2 = jnp.array([0.0, 0.0, 0.0, x, y, 1.0, -v * x, -v * y])
        return jnp.stack([r1, r2]), jnp.array([u, v])

    A_rows, b_rows = jax.vmap(rows)(src, dst)
    A = A_rows.reshape(8, 8)
    b = b_rows.reshape(8)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones((1,), h.dtype)]).reshape(3, 3)


def _rotate_vec_to_z(v):
    """Rotation Rv with ``Rv @ unit(v) = (0,0,1)`` (Rodrigues of the cross)."""
    n = v / jnp.linalg.norm(v)
    # axis = n x z, angle = arccos(n_z)
    ax = jnp.array([n[1], -n[0], 0.0])
    s = jnp.linalg.norm(ax)
    c = n[2]
    safe_ax = jnp.where(s > 1e-12, ax / jnp.maximum(s, 1e-12), jnp.array([1.0, 0.0, 0.0]))
    K = jnp.array(
        [
            [0.0, -safe_ax[2], safe_ax[1]],
            [safe_ax[2], 0.0, -safe_ax[0]],
            [-safe_ax[1], safe_ax[0], 0.0],
        ]
    )
    R = jnp.eye(3) + s * K + (1.0 - c) * (K @ K)
    return jnp.where(s > 1e-12, R, jnp.eye(3))


def _translation_lsq(R, obj_pts, xy):
    """Best translation given R: linear LSQ on the projection equations.

    For each point: (R q + t)_x - x_i (R q + t)_z = 0 (and y likewise) —
    2 linear equations in t per correspondence.
    """
    Rq = obj_pts @ R.T  # (4,3)
    x, y = xy[..., 0], xy[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    A = jnp.concatenate(
        [
            jnp.stack([ones, zeros, -x], axis=-1),
            jnp.stack([zeros, ones, -y], axis=-1),
        ],
        axis=0,
    )  # (8,3)
    b = jnp.concatenate([x * Rq[:, 2] - Rq[:, 0], y * Rq[:, 2] - Rq[:, 1]])
    AtA = A.T @ A
    Atb = A.T @ b
    return jnp.linalg.solve(AtA, Atb)


def ippe_square(corners_px, K, dist, marker_size):
    """Closed-form planar pose from 4 square-marker corners.

    IPPE (Collins & Bartoli, IJCV 2014) as used by
    ``cv.solvePnP(SOLVEPNP_IPPE_SQUARE)`` (cam.py:161-165): homography from
    the canonical square, first-order PnP around the square center giving two
    candidate rotations, translations by linear least squares, disambiguation
    by reprojection error.

    Returns ``(R, t, err2)`` of the better solution, where ``err2`` is the sum
    of squared reprojection residuals in normalized coordinates.
    """
    dtype = corners_px.dtype
    obj = marker_object_points(marker_size, dtype)  # (4,3)
    xy = undistort_points(corners_px, K, dist)  # (4,2) ideal normalized

    H = homography_4pt(obj[:, :2], xy)
    # Jacobian of the homography map at the model origin.
    v = H[:2, 2]  # projection of origin (H is normalized to H22=1)
    J = jnp.array(
        [
            [H[0, 0] - v[0] * H[2, 0], H[0, 1] - v[0] * H[2, 1]],
            [H[1, 0] - v[1] * H[2, 0], H[1, 1] - v[1] * H[2, 1]],
        ]
    )
    Rv = _rotate_vec_to_z(jnp.array([v[0], v[1], 1.0]))
    # B = [I2 | -v] Rv^T restricted to its first two columns (the third is
    # exactly zero because Rv's bottom row is unit(v,1)):
    # B[i][j] = Rv[j][i] - v_i * Rv[j][2].
    B = jnp.array(
        [
            [Rv[0, 0] - v[0] * Rv[0, 2], Rv[1, 0] - v[0] * Rv[1, 2]],
            [Rv[0, 1] - v[1] * Rv[0, 2], Rv[1, 1] - v[1] * Rv[1, 2]],
        ]
    )
    A = jnp.linalg.solve(B, J)

    # Largest singular value of A.
    ata = A.T @ A
    tr = ata[0, 0] + ata[1, 1]
    det_gap = jnp.sqrt(jnp.maximum((ata[0, 0] - ata[1, 1]) ** 2 + 4.0 * ata[0, 1] ** 2, 0.0))
    gamma = jnp.sqrt(jnp.maximum(0.5 * (tr + det_gap), 1e-30))
    P = A / gamma  # top-left 2x2 block of the canonical rotation

    b0 = jnp.sqrt(jnp.maximum(1.0 - P[0, 0] ** 2 - P[1, 0] ** 2, 0.0))
    b1 = jnp.sqrt(jnp.maximum(1.0 - P[0, 1] ** 2 - P[1, 1] ** 2, 0.0))
    sp = -(P[0, 0] * P[0, 1] + P[1, 0] * P[1, 1])
    b1 = jnp.where(sp < 0, -b1, b1)

    def build_R(sign):
        c1 = jnp.array([P[0, 0], P[1, 0], sign * b0])
        c2 = jnp.array([P[0, 1], P[1, 1], sign * b1])
        c3 = jnp.cross(c1, c2)
        Rc = jnp.stack([c1, c2, c3], axis=1)
        return Rv.T @ Rc

    def solution(sign):
        R = build_R(sign)
        t = _translation_lsq(R, obj, xy)
        pc = obj @ R.T + t
        proj = pc[:, :2] / pc[:, 2:3]
        err2 = jnp.sum((proj - xy) ** 2)
        # a solution with the marker behind the camera is invalid
        err2 = jnp.where(jnp.min(pc[:, 2]) <= 0, jnp.inf, err2)
        return R, t, err2

    R1, t1, e1 = solution(1.0)
    R2, t2, e2 = solution(-1.0)
    pick1 = e1 <= e2
    R = jnp.where(pick1, R1, R2)
    t = jnp.where(pick1, t1, t2)
    return R, t, jnp.where(pick1, e1, e2)


def iterative_planar(corners_px, K, dist, marker_size, lm_iters: int = 20):
    """``cv.solvePnP(flags=SOLVEPNP_ITERATIVE)`` for the planar-square case.

    OpenCV's ITERATIVE solver initializes planar targets from the
    object-plane -> image homography (calib3d cvFindExtrinsicCameraParams2):
    ``R ~ [h1/s, h2/s, h1 x h2 / s^2]`` orthonormalized, ``t = h3/s`` with
    ``s = sqrt(|h1||h2|)``, sign fixed so the target sits in front of the
    camera — then runs Levenberg-Marquardt on the pixel reprojection
    residual.  The reference accepts this flag string (vican/cam.py:161-165);
    VICAN's datasets use IPPE_SQUARE, but the flag must be honored.

    Returns ``(R, t, err2)`` with ``err2`` the sum of squared normalized-
    coordinate residuals of the LM-refined pose (same convention as
    :func:`ippe_square` so callers can treat the methods uniformly).
    """
    from .lie import project_so3

    dtype = corners_px.dtype
    obj = marker_object_points(marker_size, dtype)  # (4,3), z = 0
    xy = undistort_points(corners_px, K, dist)  # (4,2) ideal normalized

    H = homography_4pt(obj[:, :2], xy)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    # no depth-sign flip needed: homography_4pt pins H[2,2] = 1, so the
    # marker center maps to normalized depth t_z = 1/s > 0 by construction
    # (OpenCV's cvFindExtrinsicCameraParams2 flips on negative depth, but
    # its DLT does not normalize H[2,2], ours does)
    s = jnp.sqrt(jnp.maximum(jnp.linalg.norm(h1) * jnp.linalg.norm(h2), 1e-30))
    R0 = jnp.stack([h1 / s, h2 / s, jnp.cross(h1, h2) / (s * s)], axis=1)
    R0 = project_so3(R0[None])[0]  # nearest rotation (det fix)
    t0 = h3 / s

    R, t = refine_lm(R0, t0, corners_px, K, dist, marker_size, iters=lm_iters)
    pc = obj @ R.T + t
    proj = pc[:, :2] / pc[:, 2:3]
    err2 = jnp.sum((proj - xy) ** 2)
    return R, t, err2


def refine_lm(R, t, corners_px, K, dist, marker_size, iters: int = 20):
    """Levenberg-Marquardt pose refinement (cv.solvePnPRefineLM parity).

    Minimizes pixel reprojection residuals over (rvec, t) with an autodiff
    Jacobian and adaptive damping; fixed ``iters`` trips for static shapes
    (OpenCV's default term criteria is also 20 iterations).
    """
    from .lie import rodrigues, so3_log

    obj = marker_object_points(marker_size, corners_px.dtype)

    def residuals(params):
        Rp = rodrigues(params[:3])
        proj = project_points(obj, Rp, params[3:], K, dist)
        return (proj - corners_px).reshape(-1)

    p0 = jnp.concatenate([so3_log(R), t])

    def body(state, _):
        p, lam = state
        r = residuals(p)
        Jac = jax.jacfwd(residuals)(p)  # (8,6)
        JtJ = Jac.T @ Jac
        g = Jac.T @ r
        # LM step with current damping
        step = jnp.linalg.solve(JtJ + lam * jnp.diag(jnp.diag(JtJ)) + 1e-12 * jnp.eye(6, dtype=p.dtype), g)
        p_new = p - step
        cost = jnp.sum(r * r)
        cost_new = jnp.sum(residuals(p_new) ** 2)
        accept = cost_new < cost
        p = jnp.where(accept, p_new, p)
        lam = jnp.where(accept, lam * 0.3, lam * 3.0)
        lam = jnp.clip(lam, 1e-12, 1e12)
        return (p, lam), None

    (p, _), _ = lax.scan(body, (p0, jnp.asarray(1e-3, p0.dtype)), None, length=iters)
    return rodrigues(p[:3]), p[3:]


def reprojection_error_max(R, t, corners_px, K, dist, marker_size):
    """Max per-corner L2 pixel reprojection error (cam.py:176-179)."""
    obj = marker_object_points(marker_size, corners_px.dtype)
    proj = project_points(obj, R, t, K, dist)
    return jnp.max(jnp.linalg.norm(proj - corners_px, axis=-1))


def solve_marker_pose(corners_px, K, dist, marker_size, lm_iters: int = 20,
                      method: str = "ippe_square"):
    """Full per-marker pose path: PnP init -> LM refine -> max reproj error.

    The one-marker unit that :mod:`vican_tpu.perception` vmaps over all
    detections in a batch.  ``method`` selects the solver like the
    reference's ``flags`` string (vican/cam.py:161-165): ``"ippe_square"``
    (closed-form planar IPPE) or ``"iterative"`` (homography init + LM,
    OpenCV's SOLVEPNP_ITERATIVE).  Both get the reference's unconditional
    ``solvePnPRefineLM`` pass (cam.py:168-173).  Returns ``(R, t,
    reproj_err)``.
    """
    if method == "ippe_square":
        R0, t0, _ = ippe_square(corners_px, K, dist, marker_size)
    elif method == "iterative":
        R0, t0, _ = iterative_planar(corners_px, K, dist, marker_size,
                                     lm_iters=lm_iters)
    else:
        raise ValueError(f"unknown PnP method: {method!r}")
    R, t = refine_lm(R0, t0, corners_px, K, dist, marker_size, iters=lm_iters)
    err = reprojection_error_max(R, t, corners_px, K, dist, marker_size)
    return R, t, err

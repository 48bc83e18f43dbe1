"""Batched SO(3)/SE(3) device ops (jax.numpy; everything vmap/jit friendly).

These replace the reference's per-element NumPy/OpenCV/LAPACK calls
(vican/geometry.py, vican/bipgo.py block loops) with array-at-a-time kernels
that XLA fuses and tiles onto the TPU's MXU/VPU:

  - ``rodrigues`` / ``so3_log``      <- cv.Rodrigues (cam.py:174, geometry.py:29)
  - ``project_so3``                  <- per-block SVD loops (bipgo.py:295-332,
                                        geometry.py:175-191)
  - ``angle_deg`` / ``distance_so3`` <- geometry.py:135-172
  - ``se3_*`` helpers                <- SE3 class ops (geometry.py:194-261)
  - ``random_langevin``              <- geometry.py:13-30 noise sampler
  - ``gauge_procrustes_*``           <- geometry.py:264-325

All functions accept arbitrary leading batch dimensions.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "rodrigues",
    "quat_to_mat",
    "so3_log",
    "hat",
    "project_so3",
    "svd3_so3",
    "angle_deg",
    "distance_so3",
    "se3_compose",
    "se3_inverse",
    "se3_apply",
    "random_langevin",
    "gauge_procrustes_so3",
    "gauge_procrustes_se3",
]


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of ``(..., 3)`` vectors -> ``(..., 3, 3)``."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(vec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle ``(..., 3)`` -> rotation matrices ``(..., 3, 3)``.

    Taylor-guarded at theta -> 0 so it is safe under jit/grad.  Device
    replacement for cv.Rodrigues (reference cam.py:174).
    """
    theta2 = jnp.sum(vec * vec, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-32))
    small = theta2 < 1e-16
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks near zero.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = hat(vec)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=vec.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternions ``(..., 4)`` (w, x, y, z) -> rotations ``(..., 3, 3)``.

    Used by the solver's transfer path: rotations ship to the device as 4
    floats instead of 9 (the host link is bandwidth-bound), reconstructed
    exactly on device.
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices ``(..., 3, 3)`` -> axis-angle ``(..., 3)``.

    Inverse Rodrigues; numerically guarded near theta = 0 and theta = pi.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # Antisymmetric part gives sin(theta) * axis.
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    # Generic branch: w * theta / (2 sin theta); near zero: w / 2.
    scale_generic = theta / jnp.maximum(2.0 * sin_t, 1e-12)
    scale_small = 0.5 + theta * theta / 12.0
    near_pi = cos_t < -1.0 + 1e-6
    generic = w * jnp.where(theta < 1e-6, scale_small, scale_generic)[..., None]
    # Near pi: axis from the dominant column of R + I.
    B = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    col_norms = jnp.linalg.norm(B, axis=-2)
    col = jnp.argmax(col_norms, axis=-1)
    axis = jnp.take_along_axis(B, col[..., None, None], axis=-1)[..., 0]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    # Fix sign so that axis agrees with w (w ~ 2 sin(theta) axis >= 0 near pi).
    sign = jnp.where(jnp.sum(axis * w, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    pi_branch = axis * sign * theta[..., None]
    return jnp.where(near_pi[..., None], pi_branch, generic)


def svd3_so3(x: jnp.ndarray):
    """SVD of ``(..., 3, 3)`` blocks with SO(3)-projected factor.

    Returns ``(r, u, s, vt)`` where ``r = u diag(1,1,det(u vt)) vt`` is the
    closest rotation.  One call replaces the reference's per-block
    ``np.linalg.svd`` loops (bipgo.py:295-332) with a single batched LAPACK/XLA
    dispatch.
    """
    u, s, vt = jnp.linalg.svd(x)
    # explicit HIGHEST precision: orthonormality of the output is a
    # correctness property and must not depend on the ambient matmul
    # precision (the default is bf16-accumulation on TPU, ~2e-2 error here)
    det = jnp.linalg.det(jnp.matmul(u, vt, precision=jax.lax.Precision.HIGHEST))
    fix = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    r = jnp.matmul(u * fix[..., None, :], vt, precision=jax.lax.Precision.HIGHEST)
    return r, u, s, vt


def project_so3(x: jnp.ndarray) -> jnp.ndarray:
    """Project ``(..., 3, 3)`` matrices onto SO(3) (geometry.py:175-191)."""
    r, _, _, _ = svd3_so3(x)
    return r


def angle_deg(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in degrees of ``(..., 3, 3)`` matrices."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    rad = jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))
    return rad * (180.0 / jnp.pi)


def distance_so3(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise geodesic angle (degrees) between batched rotations."""
    return angle_deg(jnp.swapaxes(r1, -1, -2) @ r2)


def se3_compose(Ra, ta, Rb, tb):
    """Compose (Ra, ta) . (Rb, tb) -> (Ra Rb, Ra tb + ta), batched."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inverse(R, t):
    """Inverse of batched rigid transforms."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, x):
    """Apply batched rigid transforms to points ``(..., 3)``."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


@partial(jax.jit, static_argnames=("shape",))
def random_langevin(key: jax.Array, k: float, shape=()) -> jnp.ndarray:
    """Batched isotropic-Langevin SO(3) samples (geometry.py:13-30 model).

    Axis ~ isotropic Gaussian (normalized); magnitude ~ von Mises(k) sampled
    by rejection-free wrapped best-of-N Metropolis-lite: we use the standard
    von Mises sampler (Best-Fisher) expressed with a fixed number of proposal
    rounds so shapes stay static under jit.
    """
    kv, ka = jax.random.split(key)
    axis = jax.random.normal(ka, shape + (3,))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    mag = _von_mises(kv, jnp.asarray(k, jnp.float32), shape)
    return rodrigues(axis * mag[..., None])


def _von_mises(key: jax.Array, kappa: jnp.ndarray, shape=()) -> jnp.ndarray:
    """Best-Fisher von Mises sampler with a fixed proposal budget.

    Runs ROUNDS independent proposals per sample and keeps the first accepted
    one (acceptance rate of the Best-Fisher envelope is ~0.66, so 16 rounds
    leave a < 1e-7 failure probability; failures fall back to the last
    proposal).  Fixed trip count keeps the program shape static for XLA.
    """
    ROUNDS = 16
    tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa * kappa)
    rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kappa)
    r = (1.0 + rho * rho) / (2.0 * rho)

    keys = jax.random.split(key, ROUNDS)

    def proposal(k):
        k1, k2, k3 = jax.random.split(k, 3)
        u1 = jax.random.uniform(k1, shape)
        u2 = jax.random.uniform(k2, shape)
        u3 = jax.random.uniform(k3, shape)
        z = jnp.cos(jnp.pi * u1)
        f = (1.0 + r * z) / (r + z)
        c = kappa * (r - f)
        accept = (c * (2.0 - c) - u2 > 0) | (jnp.log(c / jnp.maximum(u2, 1e-30)) + 1.0 - c >= 0)
        theta = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
        return accept, theta

    accepts, thetas = jax.vmap(proposal)(keys)
    first = jnp.argmax(accepts, axis=0)
    return jnp.take_along_axis(thetas, first[None, ...], axis=0)[0]


def gauge_procrustes_so3(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
    """Rotation aligning stacks ``Ra ~ Rb @ g`` (geometry.py:264-291), batched.

    ``Ra``/``Rb``: (N, 3, 3).  Returns the 3x3 gauge rotation.
    """
    acc = jnp.sum(jnp.swapaxes(Ra, -1, -2) @ Rb, axis=0)
    return project_so3(acc.T)


def gauge_procrustes_se3(Ra, ta, Rb, tb):
    """SE(3) gauge aligning ``(Ra,ta) ~ (Rb,tb) @ g`` (geometry.py:294-325).

    Inputs are (N,3,3) rotation stacks and (N,3) translation stacks.
    Returns (g_R, g_t).
    """
    g_r = gauge_procrustes_so3(Ra, Rb)
    diff = ta - tb
    g_t = jnp.mean(jnp.einsum("nji,nj->ni", Rb, diff), axis=0)
    return g_r, g_t

"""Synthetic calibration-problem generator.

The reference generates its datasets offline with Blender (render.py); for
solver tests and benchmarks we generate the *pose graph* directly: ground
truth camera extrinsics, a marker object, a random object trajectory, and
noisy camera->marker SE(3) edge measurements in the exact edge-dict schema of
the reference (``{(cam_id, "<t>_<marker>"): {"pose": SE3, "corners": ...,
"reprojected_err": ..., "im_filename": ...}}`` — vican/cam.py:120-124,
README.md:55).  Noise follows the paper's model: isotropic Langevin rotations
+ Gaussian translations (vican/geometry.py:13-30).
"""
from __future__ import annotations

import numpy as np

from .geometry import SE3, rodrigues

__all__ = ["SyntheticProblem", "make_problem"]


class SyntheticProblem:
    """Ground truth + measurements for a synthetic camera-network problem."""

    def __init__(self, cams_gt, obj_gt, markers_gt, edges):
        self.cams_gt = cams_gt  # {cam_id: SE3} camera->world
        self.obj_gt = obj_gt  # {t: SE3} object->world per timestep
        self.markers_gt = markers_gt  # {marker_id: SE3} marker->object
        self.edges = edges  # reference-schema edge dict

    def constraints(self) -> dict:
        """Marker constraints in the form bipartite_se3sync expects."""
        return dict(self.markers_gt)


def _random_rotation(rng: np.random.Generator) -> np.ndarray:
    v = rng.normal(size=3)
    v = v / np.linalg.norm(v) * rng.uniform(0.0, np.pi)
    return rodrigues(v)


def _langevin_noise(rng: np.random.Generator, kappa: float) -> np.ndarray:
    """Small random rotation with Langevin-like concentration ``kappa``."""
    v = rng.normal(size=3)
    # von Mises magnitude ~ N(0, 1/sqrt(kappa)) for large kappa
    mag = rng.normal(0.0, 1.0 / np.sqrt(max(kappa, 1e-9)))
    v = v / np.linalg.norm(v) * mag
    return rodrigues(v)


def make_problem(
    seed: int = 0,
    n_cams: int = 10,
    n_times: int = 100,
    n_markers: int = 8,
    p_obs: float = 0.35,
    kappa_r: float = 1e4,
    sigma_t: float = 1e-3,
    scene_radius: float = 5.0,
    marker_radius: float = 0.3,
) -> SyntheticProblem:
    """Build a random camera network observing a moving marker object.

    Every (camera, time, marker) triple is observed independently with
    probability ``p_obs``; each camera and timestep is guaranteed at least one
    observation so the graph is connected with high probability.
    """
    rng = np.random.default_rng(seed)

    cams_gt = {}
    for c in range(n_cams):
        cams_gt[str(c)] = SE3(
            R=_random_rotation(rng), t=rng.uniform(-scene_radius, scene_radius, size=3)
        )

    markers_gt = {}
    for m in range(n_markers):
        markers_gt[str(m)] = SE3(
            R=_random_rotation(rng), t=rng.uniform(-marker_radius, marker_radius, size=3)
        )

    obj_gt = {}
    for t in range(n_times):
        obj_gt[str(t)] = SE3(
            R=_random_rotation(rng), t=rng.uniform(-scene_radius, scene_radius, size=3)
        )

    edges = {}
    cam_ids = list(cams_gt.keys())
    time_ids = list(obj_gt.keys())
    obs = rng.random((n_cams, n_times, n_markers)) < p_obs
    # guarantee connectivity: every camera and every timestep sees something
    for ci in range(n_cams):
        if not obs[ci].any():
            obs[ci, rng.integers(n_times), rng.integers(n_markers)] = True
    for ti in range(n_times):
        if not obs[:, ti].any():
            obs[rng.integers(n_cams), ti, rng.integers(n_markers)] = True

    for ci, c in enumerate(cam_ids):
        cam_inv = cams_gt[c].inv()
        for ti, t in enumerate(time_ids):
            marker_world_base = cam_inv @ obj_gt[t]
            for m in range(n_markers):
                if not obs[ci, ti, m]:
                    continue
                gt_pose = marker_world_base @ markers_gt[str(m)]
                R = _langevin_noise(rng, kappa_r) @ gt_pose.R()
                tvec = gt_pose.t() + rng.normal(0.0, sigma_t, size=3)
                corners = rng.uniform(0, 1280, size=(4, 2))
                edges[(c, f"{t}_{m}")] = {
                    "pose": SE3(R=R, t=tvec),
                    "corners": corners,
                    "reprojected_err": float(rng.uniform(0.0, 0.04)),
                    "im_filename": f"{t}/{c}.jpg",
                }

    return SyntheticProblem(cams_gt, obj_gt, markers_gt, edges)

"""Lightweight synthetic dataset renderer (reference render.py analogue).

The reference generates its datasets offline with Blender/Cycles
(render.py:437-519 — hours of GPU time).  For tests, demos and perception
benchmarks we render the same *directory layout* with a homography-warp
rasterizer: an ArUco-marker cube moving through a static camera network,
written as ``root/<t>/<cam_id>.jpg`` + ``cameras.json`` +
``object_pose_0.json`` exactly as :class:`vican_tpu.dataset.Dataset` expects
(dataset.py:14-99 schema; flat cameras.json like render.py:409's
``render_cube_calib`` output).

Rendering itself is host-side OpenCV (it is offline data generation, not the
compute path — SURVEY.md §2.2 explicitly scopes Blender out of the framework
core).
"""
from __future__ import annotations

import json
import os

import numpy as np

from .geometry import SE3

__all__ = [
    "make_cube_markers",
    "render_image",
    "render_dataset",
    "look_at",
    "boxes_intersect",
    "cams_seeing",
    "cube_pose_candidate",
]


def make_cube_markers(
    aruco: str = "DICT_4X4_1000",
    cube_size: float = 0.575,
    markers_per_face: int = 4,
    marker_ratio: float = 0.38,
    ids=None,
) -> dict:
    """Marker poses on a cube: ``{marker_id: SE3 marker->object}``.

    ``markers_per_face`` in {1, 4}: one centered marker or a 2x2 grid per
    face.  Marker frame: x right, y up in the marker plane, z out of the
    face.  The datasets' cube carries 24 markers (render.py:467-469).
    """
    h = cube_size / 2.0
    # face frames: (normal axis, +z out), x/y spanning the face
    faces = [
        (np.array([0, 0, 1.0]), np.array([1.0, 0, 0]), np.array([0, 1.0, 0])),
        (np.array([0, 0, -1.0]), np.array([-1.0, 0, 0]), np.array([0, 1.0, 0])),
        (np.array([1.0, 0, 0]), np.array([0, 0, -1.0]), np.array([0, 1.0, 0])),
        (np.array([-1.0, 0, 0]), np.array([0, 0, 1.0]), np.array([0, 1.0, 0])),
        (np.array([0, 1.0, 0]), np.array([1.0, 0, 0]), np.array([0, 0, -1.0])),
        (np.array([0, -1.0, 0]), np.array([1.0, 0, 0]), np.array([0, 0, 1.0])),
    ]
    if markers_per_face == 1:
        offsets = [(0.0, 0.0)]
    elif markers_per_face == 4:
        q = cube_size / 4.0
        offsets = [(-q, -q), (q, -q), (-q, q), (q, q)]
    else:
        raise ValueError("markers_per_face must be 1 or 4")

    out = {}
    mid = 0
    for normal, ex, ey in faces:
        for ox, oy in offsets:
            R = np.stack([ex, ey, normal], axis=1)
            t = normal * h + ex * ox + ey * oy
            key = str(ids[mid]) if ids is not None else str(mid)
            out[key] = SE3(R=R, t=t)
            mid += 1
    return out


def look_at(position, target, up=(0, 0, 1.0)) -> SE3:
    """Camera extrinsics (camera->world) looking from ``position`` at ``target``.

    OpenCV camera convention: +z forward, +x right, +y down.
    """
    position = np.asarray(position, float)
    fwd = np.asarray(target, float) - position
    fwd = fwd / np.linalg.norm(fwd)
    upv = np.asarray(up, float)
    right = np.cross(fwd, upv)
    if np.linalg.norm(right) < 1e-9:
        right = np.cross(fwd, np.array([0, 1.0, 0]))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=1)
    return SE3(R=R, t=position)


def boxes_intersect(c_a, half_a, R_a, c_b, half_b, R_b) -> bool:
    """Oriented-box overlap via the separating-axis theorem.

    Replaces the reference's Blender BVH mesh-overlap test
    (render.py:164-205): candidate cube poses are rejected when the cube
    intersects a keep-out volume.  15 candidate axes (3 + 3 face normals +
    9 edge cross products).
    """
    c_a, c_b = np.asarray(c_a, float), np.asarray(c_b, float)
    half_a, half_b = np.asarray(half_a, float), np.asarray(half_b, float)
    R_a, R_b = np.asarray(R_a, float), np.asarray(R_b, float)
    d = c_b - c_a
    axes = [R_a[:, i] for i in range(3)] + [R_b[:, i] for i in range(3)]
    for i in range(3):
        for j in range(3):
            cr = np.cross(R_a[:, i], R_b[:, j])
            n = np.linalg.norm(cr)
            if n > 1e-9:
                axes.append(cr / n)
    for ax in axes:
        ra = np.sum(half_a * np.abs(ax @ R_a))
        rb = np.sum(half_b * np.abs(ax @ R_b))
        if abs(ax @ d) > ra + rb:
            return False
    return True


def cams_seeing(cams: dict, point, distance_cutoff: float = 7.0) -> list:
    """Camera ids whose frustum contains ``point`` within the cutoff.

    The reference's visibility test (render.py:348-371, 374-390): point in
    front of the camera, projecting inside the image, closer than
    ``distance_cutoff`` (7 m in the reference scenes).
    """
    point = np.asarray(point, float)
    seen = []
    for cid, cam in cams.items():
        pc = cam.extrinsics.inv().apply(point.reshape(3, 1)).ravel()
        if pc[2] <= 0.05 or np.linalg.norm(pc) > distance_cutoff:
            continue
        K = np.asarray(cam.intrinsics, float)
        u = K[0, 0] * pc[0] / pc[2] + K[0, 2]
        v = K[1, 1] * pc[1] / pc[2] + K[1, 2]
        if 0 <= u < cam.resolution_x and 0 <= v < cam.resolution_y:
            seen.append(cid)
    return seen


def cube_pose_candidate(
    rng: np.random.Generator,
    cams: dict,
    region_low,
    region_high,
    *,
    cube_size: float = 0.575,
    keep_out=(),
    min_views: int = 2,
    distance_cutoff: float = 7.0,
    max_tries: int = 200,
) -> SE3 | None:
    """Sample an accepted object pose like the reference's scene generators
    (render.py:297-371): uniform position in ``[region_low, region_high]``
    and uniform random rotation, rejected until the cube avoids every
    keep-out box and its center is in view of at least ``min_views`` cameras
    within ``distance_cutoff``.  ``keep_out``: iterable of ``(center,
    half_sizes)`` or ``(center, half_sizes, R)`` boxes.  Returns None when
    no candidate is accepted in ``max_tries`` draws.
    """
    from .geometry import rodrigues

    lo = np.asarray(region_low, float)
    hi = np.asarray(region_high, float)
    half = np.full(3, cube_size / 2.0)
    for _ in range(max_tries):
        pos = rng.uniform(lo, hi)
        v = rng.normal(size=3)
        v = v / max(np.linalg.norm(v), 1e-12) * rng.uniform(0.0, np.pi)
        R = rodrigues(v)
        bad = False
        for box in keep_out:
            c_b, h_b = box[0], box[1]
            R_b = box[2] if len(box) > 2 else np.eye(3)
            if boxes_intersect(pos, half, R, c_b, h_b, R_b):
                bad = True
                break
        if bad:
            continue
        if len(cams_seeing(cams, pos, distance_cutoff)) < min_views:
            continue
        return SE3(R=R, t=pos)
    return None


def render_image(
    cam,
    marker_world: dict,
    marker_images: dict,
    marker_size: float,
    background: int = 170,
    occluders=(),
) -> np.ndarray:
    """Rasterize markers (and occluder boxes) into one camera image.

    ``marker_world``: {id: SE3 marker->world}; ``marker_images``: {id: uint8
    square marker bitmap}; ``occluders``: iterable of ``(SE3 box->world,
    half_sizes)`` gray boxes that hide markers behind them.  Returns uint8
    (H, W, 3) BGR.

    A single painter's draw list covers marker quads and occluder box faces
    sorted far-to-near by centroid depth — quad-granularity occlusion (the
    scene generators keep geometry non-interpenetrating via the keep-out
    test, where painter ordering is exact for convex bodies).

    Lens distortion: marker corners are projected through the camera's full
    OpenCV distortion model (the 12-coefficient rational/thin-prism set the
    datasets use — reference render.py:293, vican/cam.py:31-32), so detected
    corners land where a real distorted camera would put them.  The marker
    interior is homography-warped between those corners — edge bowing inside
    a single marker is second-order for markers small relative to the
    distortion scale, and corner positions are what drive PnP.
    """
    import cv2 as cv

    W, H = cam.resolution_x, cam.resolution_y
    K = np.asarray(cam.intrinsics, np.float64)
    dist = np.zeros(12) if cam.distortion is None else np.atleast_1d(
        np.asarray(cam.distortion, np.float64)
    )
    img = np.full((H, W), background, np.uint8)
    cam_inv = cam.extrinsics.inv()

    h = marker_size / 2.0
    # marker corners, TL TR BR BL in the marker frame (z = 0 plane)
    corners_m = np.array([[-h, h, 0], [h, h, 0], [h, -h, 0], [-h, -h, 0]])

    def project(pts_c):
        rvec = np.zeros(3)
        proj, _ = cv.projectPoints(pts_c, rvec, np.zeros(3), K, dist)
        return proj.reshape(-1, 2)

    draw_list = []  # (mean_depth, kind, payload)
    for mid, pose_w in marker_world.items():
        pc = cam_inv @ pose_w  # marker -> camera
        Rmc, tmc = np.asarray(pc.R(), float), np.asarray(pc.t(), float)
        if tmc[2] <= 0.05:
            continue
        # facing check: marker +z toward the camera
        if np.dot(Rmc[:, 2], tmc) >= 0:
            continue
        pts_c = corners_m @ Rmc.T + tmc
        if (pts_c[:, 2] <= 0.05).any():
            continue
        proj = project(pts_c)
        if (proj[:, 0] < -50).all() or (proj[:, 0] > W + 50).all():
            continue
        draw_list.append((pts_c[:, 2].mean(), "marker", (mid, proj)))

    hx = np.array([[1, 1, -1, -1, 1, 1, -1, -1],
                   [1, -1, -1, 1, 1, -1, -1, 1],
                   [1, 1, 1, 1, -1, -1, -1, -1]], float).T  # box corner signs
    face_idx = [(0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
                (2, 3, 7, 6), (1, 2, 6, 5), (3, 0, 4, 7)]
    for pose_w, half in occluders:
        pc = cam_inv @ pose_w
        Rb, tb = np.asarray(pc.R(), float), np.asarray(pc.t(), float)
        corners_c = (hx * np.asarray(half, float)) @ Rb.T + tb
        for fi, f in enumerate(face_idx):
            pts_c = corners_c[list(f)]
            if (pts_c[:, 2] <= 0.05).any():
                continue
            # backface cull via the face normal in camera coords
            n = np.cross(pts_c[1] - pts_c[0], pts_c[3] - pts_c[0])
            if np.dot(n, pts_c.mean(axis=0)) >= 0:
                n = -n
            shade = int(np.clip(90 + 60 * abs(n[2]) / max(np.linalg.norm(n), 1e-9), 0, 255))
            draw_list.append((pts_c[:, 2].mean(), "face", (project(pts_c), shade)))

    for _, kind, payload in sorted(draw_list, key=lambda x: -x[0]):
        if kind == "face":
            proj, shade = payload
            poly = np.round(proj).astype(np.int32)
            cv.fillConvexPoly(img, poly, shade, lineType=cv.LINE_AA)
            continue
        mid, proj = payload
        tile = marker_images[mid]
        N = tile.shape[0]
        # continuous marker square spans [-0.5, N-0.5] in source pixel-center
        # coords; map so the physical boundary lands exactly on `proj`
        src = np.array(
            [[-0.5, -0.5], [N - 0.5, -0.5], [N - 0.5, N - 0.5], [-0.5, N - 0.5]],
            np.float32,
        )
        Hm = cv.getPerspectiveTransform(src, proj.astype(np.float32))
        mask_tile = np.full((N, N), 255, np.uint8)
        warped = cv.warpPerspective(tile, Hm, (W, H), flags=cv.INTER_LINEAR,
                                    borderMode=cv.BORDER_CONSTANT, borderValue=0)
        wmask = cv.warpPerspective(mask_tile, Hm, (W, H), flags=cv.INTER_LINEAR,
                                   borderMode=cv.BORDER_CONSTANT, borderValue=0)
        alpha = wmask.astype(np.float32) / 255.0
        img = np.clip(img * (1 - alpha) + warped * alpha, 0, 255).astype(np.uint8)
    return np.stack([img] * 3, axis=-1)


def render_dataset(
    root: str,
    cams: dict,
    obj_traj: dict,
    marker_poses: dict,
    aruco: str = "DICT_4X4_1000",
    marker_size: float = 0.48 * 0.575 / 2,
    marker_px: int = 120,
    jpeg_quality: int = 95,
    occluders=(),
    shard: tuple | None = None,
    resume: bool = False,
    only_visible_cams: bool = False,
    distance_cutoff: float = 7.0,
) -> None:
    """Write a full Dataset-layout directory.

    ``cams``: {cam_id: Camera}; ``obj_traj``: {t: SE3 object->world};
    ``marker_poses``: {marker_id: SE3 marker->object};
    ``occluders``: ``(SE3, half_sizes)`` boxes passed to
    :func:`render_image`.

    Render-farm features mirroring the reference's multi-process driver
    (render.py:491-519):

    - ``shard=(core_id, num_cores)``: this invocation renders only the
      timesteps with ``index % num_cores == core_id`` (the reference's
      ``t = i * num_cores + core_id`` striping) and writes its ground-truth
      poses to ``object_pose_<core_id>.json`` — per-shard output files, no
      write races; :class:`~vican_tpu.dataset.Dataset` merges all shards.
    - ``resume=True``: an existing ``object_pose_<core_id>.json`` is
      reloaded and appended to, and timesteps whose images already exist
      are skipped (the reference's reload-append restart support,
      render.py:506-515).
    - ``only_visible_cams``: render only the cameras that actually see the
      object center (render.py:374-390), like the real datasets where a
      timestep directory holds images from a camera subset.
    """
    import cv2 as cv

    from .ops.dictionary import get_dictionary

    bits, n = get_dictionary(aruco)
    cells = n + 2
    os.makedirs(root, exist_ok=True)

    marker_images = {}
    for mid in marker_poses:
        pattern = bits[int(mid)]
        tile = np.zeros((cells, cells), np.uint8)
        tile[1:-1, 1:-1] = pattern * 255
        scale = max(marker_px // cells, 1)
        marker_images[mid] = np.kron(tile, np.ones((scale, scale), np.uint8))

    cams_json = {}
    for cid, cam in cams.items():
        K = np.asarray(cam.intrinsics, float)
        cams_json[cid] = {
            "fx": K[0, 0], "fy": K[1, 1], "cx": K[0, 2], "cy": K[1, 2],
            "distortion": (
                np.zeros(12) if cam.distortion is None
                else np.atleast_1d(np.asarray(cam.distortion, float))
            ).tolist(),
            "R": np.asarray(cam.extrinsics.R(), float).tolist(),
            "t": np.asarray(cam.extrinsics.t(), float).tolist(),
            "resolution_x": cam.resolution_x,
            "resolution_y": cam.resolution_y,
        }
    with open(os.path.join(root, "cameras.json"), "w") as f:
        json.dump(cams_json, f)

    core_id, num_cores = shard if shard is not None else (0, 1)
    pose_file = os.path.join(root, f"object_pose_{core_id}.json")
    obj_json = {}
    if resume and os.path.exists(pose_file):
        with open(pose_file) as f:
            obj_json = json.load(f)

    for i, (t, obj_pose) in enumerate(obj_traj.items()):
        if shard is not None and i % num_cores != core_id:
            continue
        visible = (
            cams_seeing(cams, obj_pose.t(), distance_cutoff)
            if only_visible_cams else list(cams)
        )
        tdir = os.path.join(root, str(t))
        if resume and str(t) in obj_json and all(
            os.path.exists(os.path.join(tdir, f"{cid}.jpg")) for cid in visible
        ):
            continue
        obj_json[str(t)] = {
            "R": np.asarray(obj_pose.R(), float).tolist(),
            "t": np.asarray(obj_pose.t(), float).tolist(),
        }
        marker_world = {m: obj_pose @ mp for m, mp in marker_poses.items()}
        os.makedirs(tdir, exist_ok=True)
        for cid in visible:
            img = render_image(cams[cid], marker_world, marker_images,
                               marker_size, occluders=occluders)
            cv.imwrite(
                os.path.join(tdir, f"{cid}.jpg"), img,
                [cv.IMWRITE_JPEG_QUALITY, jpeg_quality],
            )
        # periodic write-through (every 25 timesteps): a killed render farm
        # process resumes from the last flushed timestep (render.py:506-515
        # rewrites per timestep, which is O(T^2) json encoding at 10k steps)
        if len(obj_json) % 25 == 0:
            with open(pose_file, "w") as f:
                json.dump(obj_json, f)
    with open(pose_file, "w") as f:
        json.dump(obj_json, f)

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

__all__ = ["make_cube_markers", "render_image", "render_dataset", "look_at"]


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


def render_image(
    cam,
    marker_world: dict,
    marker_images: dict,
    marker_size: float,
    background: int = 170,
) -> np.ndarray:
    """Rasterize markers into one camera image (painter's algorithm).

    ``marker_world``: {id: SE3 marker->world}; ``marker_images``: {id: uint8
    square marker bitmap}.  Returns uint8 (H, W, 3) BGR.

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

    depths = []
    for mid, pose_w in marker_world.items():
        pc = cam_inv @ pose_w  # marker -> camera
        depths.append((pc.t()[2], mid, pc))
    # far to near
    for _, mid, pc in sorted(depths, key=lambda x: -x[0]):
        Rmc, tmc = np.asarray(pc.R(), float), np.asarray(pc.t(), float)
        if tmc[2] <= 0.05:
            continue
        # facing check: marker +z toward the camera
        normal_c = Rmc[:, 2]
        if np.dot(normal_c, tmc) >= 0:
            continue
        pts_c = corners_m @ Rmc.T + tmc
        if (pts_c[:, 2] <= 0.05).any():
            continue
        rvec, _ = cv.Rodrigues(Rmc)
        proj, _ = cv.projectPoints(corners_m, rvec, tmc.reshape(3, 1), K, dist)
        proj = proj.reshape(4, 2)
        if (proj[:, 0] < -50).all() or (proj[:, 0] > W + 50).all():
            continue
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
) -> None:
    """Write a full Dataset-layout directory.

    ``cams``: {cam_id: Camera}; ``obj_traj``: {t: SE3 object->world};
    ``marker_poses``: {marker_id: SE3 marker->object}.
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

    obj_json = {}
    for t, obj_pose in obj_traj.items():
        obj_json[t] = {
            "R": np.asarray(obj_pose.R(), float).tolist(),
            "t": np.asarray(obj_pose.t(), float).tolist(),
        }
        marker_world = {m: obj_pose @ mp for m, mp in marker_poses.items()}
        tdir = os.path.join(root, str(t))
        os.makedirs(tdir, exist_ok=True)
        for cid, cam in cams.items():
            img = render_image(cam, marker_world, marker_images, marker_size)
            cv.imwrite(
                os.path.join(tdir, f"{cid}.jpg"), img,
                [cv.IMWRITE_JPEG_QUALITY, jpeg_quality],
            )
    with open(os.path.join(root, "object_pose_0.json"), "w") as f:
        json.dump(obj_json, f)

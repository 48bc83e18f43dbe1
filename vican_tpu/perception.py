"""Batched perception driver: images -> camera-marker edge dict.

The reference fans one OpenCV pipeline per image over a multiprocessing pool
(vican/cam.py:190-265).  Here the host stage only decodes JPEGs and pads
batches; everything per-pixel and per-marker (threshold sweep, component
labeling, quad extraction, subpixel refinement, bit decoding, IPPE PnP, LM
refinement, reprojection error) runs as one jitted device program per batch
(:mod:`vican_tpu.ops.detect` + :mod:`vican_tpu.ops.pnp`).

Corner convention note: corners are the *physical* marker boundary (intensity
transition midpoint).  OpenCV's detector reports quads translated by
+(0.5, 0.5) source pixels (its lattice convention); on synthetic renders our
corners land ~4x closer to ground truth (see tests/test_detect.py).
"""
from __future__ import annotations

from typing import Iterable

import numpy as np

from .cam import Camera, gen_marker_uid
from .geometry import SE3
from .utils.registry import CORNER_REFINE, PNP_FLAGS, resolve

__all__ = ["estimate_pose_batched", "load_images"]


def load_images(filenames: Iterable[str]) -> np.ndarray:
    """Host JPEG decode into a uint8 (B, H, W, 3) BGR batch.

    Input-pipeline stage (SURVEY.md §2.2): file I/O stays on the host; decoded
    frames are shipped to the device as uint8 to minimize transfer bytes.
    """
    import cv2 as cv

    ims = []
    for fn in filenames:
        im = cv.imread(fn)
        if im is None:
            raise FileNotFoundError(f"could not read image: {fn}")
        ims.append(im)
    shapes = {im.shape for im in ims}
    if len(shapes) != 1:
        raise ValueError(f"mixed image shapes in batch: {shapes}")
    return np.stack(ims)


_PIPELINE_CACHE: dict = {}


def _get_pipeline(H, W, B, D, n_bits, params, lm_iters, brightness, contrast, marker_size):
    """Build (and cache) the jitted batch program for a given geometry.

    brightness/contrast/marker_size are trace-time constants (the reference
    passes them per run, not per image — cam.py:190-198).
    """
    key = (H, W, B, D, n_bits, params, lm_iters, brightness, contrast, marker_size)
    if key in _PIPELINE_CACHE:
        return _PIPELINE_CACHE[key]

    import jax
    import jax.numpy as jnp

    from .ops import detect as D_
    from .ops import pnp as P_

    @jax.jit
    def run(images_u8, Ks, dists, table):
        with jax.default_matmul_precision("highest"):
            gray = D_.preprocess(images_u8, brightness, contrast)  # (B,H,W)
            det = jax.vmap(lambda g: D_.detect_markers(g, table, n_bits, params))(gray)
            # flatten (B, D) detections and solve PnP per detection with the
            # owning image's intrinsics
            corners = det.corners.reshape(B * D, 4, 2)
            ids = det.ids.reshape(B * D)
            valid = det.valid.reshape(B * D)
            im_of = jnp.repeat(jnp.arange(B), D)
            K_e = Ks[im_of]
            dist_e = dists[im_of]

            def solve(c, K, dist):
                return P_.solve_marker_pose(c, K, dist, marker_size, lm_iters=lm_iters)

            R, t, err = jax.vmap(solve)(corners, K_e, dist_e)
            finite = (
                jnp.isfinite(err)
                & jnp.all(jnp.isfinite(R), axis=(1, 2))
                & jnp.all(jnp.isfinite(t), axis=1)
            )
            return corners, ids, valid & finite, R, t, err

    _PIPELINE_CACHE[key] = run
    return run


def estimate_pose_batched(
    im_filenames: list[str],
    cams: list[Camera],
    aruco: str,
    marker_size: float,
    corner_refine: str,
    brightness: int,
    contrast: int,
    flags: str,
    batch_size: int = 32,
    lm_iters: int = 20,
    detector_params=None,
    verbose: bool = True,
) -> dict:
    """Run the device perception pipeline over all images.

    Returns the reference edge dict (cam.py:120-124 schema).
    """
    import jax.numpy as jnp

    from .ops import detect as D_
    from .ops.dictionary import get_dictionary, marker_bits_table

    # resolve string options through registries (the reference eval()s OpenCV
    # names — cam.py:126-135; we validate instead)
    refine_kind = resolve(CORNER_REFINE, corner_refine, "corner_refine")
    resolve(PNP_FLAGS, flags, "flags")  # currently always the IPPE-square path
    _, n_bits = get_dictionary(aruco)
    table = jnp.asarray(marker_bits_table(aruco))

    params = detector_params or D_.DetectorParams()
    if refine_kind == "none":
        params = params._replace(refine_samples=0)

    out: dict = {}
    B = batch_size
    total_det = 0
    for start in range(0, len(im_filenames), B):
        batch_files = im_filenames[start : start + B]
        batch_cams = cams[start : start + B]
        images = load_images(batch_files)
        nb = len(batch_files)
        if nb < B:  # pad the tail batch
            images = np.concatenate([images, np.repeat(images[-1:], B - nb, axis=0)])
            batch_cams = batch_cams + [batch_cams[-1]] * (B - nb)
        H, W = images.shape[1:3]
        Ks = np.stack([np.asarray(c.intrinsics, np.float32) for c in batch_cams])
        dists = np.stack(
            [
                np.asarray(
                    np.pad(np.atleast_1d(c.distortion).astype(np.float32), (0, 14))[:14]
                )
                for c in batch_cams
            ]
        )

        run = _get_pipeline(
            H, W, B, params.max_detections, n_bits, params, lm_iters,
            float(brightness), float(contrast), float(marker_size),
        )
        corners, ids, valid, R, t, err = run(
            jnp.asarray(images), jnp.asarray(Ks), jnp.asarray(dists), table
        )
        corners = np.asarray(corners)
        ids = np.asarray(ids)
        valid = np.asarray(valid)
        R = np.asarray(R, np.float64)
        t = np.asarray(t, np.float64)
        err = np.asarray(err)

        Dcap = params.max_detections
        for j in range(nb):
            fn = batch_files[j]
            cam = batch_cams[j]
            for k in range(Dcap):
                e = j * Dcap + k
                if not valid[e]:
                    continue
                key = (cam.id, gen_marker_uid(fn, str(int(ids[e]))))
                out[key] = {
                    "pose": SE3(R=R[e], t=t[e]),
                    "corners": corners[e].astype(np.float64),
                    "reprojected_err": float(err[e]),
                    "im_filename": fn,
                }
                total_det += 1
        if verbose:
            print(
                f"  batch {start // B}: {nb} images, {int(valid[:nb * Dcap].sum())} detections"
            )
    if verbose:
        n_images = len({v["im_filename"] for v in out.values()})
        print(f"Found markers in {n_images} images ({total_det} detections).")
    return out

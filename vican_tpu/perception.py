"""Batched perception driver: images -> camera-marker edge dict.

The reference fans one OpenCV pipeline per image over a multiprocessing pool
(vican/cam.py:190-265).  Here the work splits by what each processor is good
at:

- **Host**: JPEG decode, the reference's int16 preprocessing (cam.py:137-145),
  the adaptive-threshold sweep (box filters), and connected-component quad
  candidates via the C union-find kernel (_native/fastccl.c) — labeling is
  irregular pointer-chasing where a CPU two-pass beats any dense-tensor
  formulation by orders of magnitude.
- **Device (one jitted program per batch)**: subpixel corner refinement,
  homography bit sampling + dictionary matching, duplicate suppression, and
  the full PnP chain (IPPE square -> LM -> reprojection error) with per-image
  intrinsics — all batched dense numerics.

A pure-device detection path also exists (:func:`vican_tpu.ops.detect.
detect_markers`) and is used when the C kernel is unavailable.

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

__all__ = ["estimate_pose_batched", "load_images", "host_preprocess", "host_candidates"]


def load_images(filenames: Iterable[str]) -> np.ndarray:
    """Host JPEG decode into a uint8 (B, H, W, 3) BGR batch."""
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


def host_preprocess(images: np.ndarray, brightness: float, contrast: float) -> np.ndarray:
    """Reference contrast/brightness + BGR grayscale, on host (uint8 out).

    Bit-matches cam.py:137-145: int16 scale, clip, uint8 truncation, then
    OpenCV BGR2GRAY.
    """
    import cv2 as cv

    x = images.astype(np.float32)
    if contrast != 0:
        x = x * (contrast / 127.0 + 1.0) - contrast
    x = x + brightness
    x = np.clip(x, 0.0, 255.0).astype(np.uint8)
    if x.ndim == 4 and x.shape[-1] == 3:
        x = np.stack([cv.cvtColor(im, cv.COLOR_BGR2GRAY) for im in x])
    return x


def _quad_gates(quads: np.ndarray, areas: np.ndarray, H: int, W: int, params) -> np.ndarray:
    """Vectorized candidate validity gates (same rules as ops.detect.extract_quads)."""
    x = quads[..., 0]
    y = quads[..., 1]
    x2 = np.roll(x, -1, axis=-1)
    y2 = np.roll(y, -1, axis=-1)
    shoelace = np.sum(x * y2 - x2 * y, axis=-1)
    quad_area = 0.5 * np.abs(shoelace)
    edges = np.roll(quads, -1, axis=-2) - quads
    edge_len = np.linalg.norm(edges, axis=-1)
    e_next = np.roll(edges, -1, axis=-2)
    crosses = edges[..., 0] * e_next[..., 1] - edges[..., 1] * e_next[..., 0]
    convex = (crosses > 0).all(-1) | (crosses < 0).all(-1)
    m = params.border_margin
    inside = (
        (quads[..., 0] >= m).all(-1)
        & (quads[..., 0] <= W - 1 - m).all(-1)
        & (quads[..., 1] >= m).all(-1)
        & (quads[..., 1] <= H - 1 - m).all(-1)
    )
    fill = areas / np.maximum(quad_area, 1.0)
    return (
        (areas >= params.min_area)
        & (edge_len.min(-1) >= 5.0)
        & inside
        & convex
        & (fill > 0.2)
    )


def host_candidates(gray: np.ndarray, params) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threshold sweep + C CCL quad candidates for a (B, H, W) uint8 batch.

    Returns ``(quads (B, Q, 4, 2) float32, valid (B, Q) bool, areas)`` with
    ``Q = len(win_sizes) * max_candidates``; quads are clockwise-wound.
    """
    import cv2 as cv

    from ._native import get_fastccl

    ccl = get_fastccl()
    if ccl is None:
        raise RuntimeError("fastccl unavailable; use the pure-device detect path")

    B, H, W = gray.shape
    K = params.max_candidates
    Wn = len(params.win_sizes)
    quads = np.zeros((B, Wn * K, 4, 2), np.float32)
    areas = np.zeros((B, Wn * K), np.float32)
    valid = np.zeros((B, Wn * K), bool)
    max_area = params.max_area_rate * H * W
    for b in range(B):
        g = gray[b]
        for wi, win in enumerate(params.win_sizes):
            mean = cv.boxFilter(g, cv.CV_32F, (win, win), borderType=cv.BORDER_REPLICATE)
            fg = (g.astype(np.float32) <= mean - params.thresh_const).astype(np.uint8)
            c_bytes, a_bytes, cnt = ccl.quad_candidates(
                np.ascontiguousarray(fg), H, W, K, params.min_area, max_area
            )
            q = np.frombuffer(c_bytes, np.float32).reshape(K, 4, 2)
            a = np.frombuffer(a_bytes, np.int32)
            sl = wi * K
            quads[b, sl : sl + K] = q
            areas[b, sl : sl + K] = a
            valid[b, sl : sl + cnt] = True

    # enforce clockwise winding (image coords): positive shoelace
    x = quads[..., 0]
    y = quads[..., 1]
    shoelace = np.sum(x * np.roll(y, -1, -1) - np.roll(x, -1, -1) * y, axis=-1)
    flip = shoelace < 0
    quads[flip] = quads[flip][:, [0, 3, 2, 1]]

    valid &= _quad_gates(quads, areas, H, W, params)
    return quads, valid, areas


_PIPELINE_CACHE: dict = {}


def _get_pipeline(key, builder):
    if key not in _PIPELINE_CACHE:
        _PIPELINE_CACHE[key] = builder()
    return _PIPELINE_CACHE[key]


def _build_hybrid(B, Q, n_bits, params, lm_iters, marker_size):
    import jax
    import jax.numpy as jnp

    from .ops import detect as D_
    from .ops import pnp as P_

    D = params.max_detections

    @jax.jit
    def run(gray_u8, quads, valid, areas, Ks, dists, table):
        with jax.default_matmul_precision("highest"):
            gray = gray_u8.astype(jnp.float32)

            def per_image(g, q, v, a):
                refined = jax.vmap(lambda qq: D_.refine_quad(g, qq, params))(q)
                ids, rots, corners, ok = D_.decode_quads(
                    g, refined, v, table, n_bits, params
                )
                return D_.dedup_and_compact(corners, ids, ok, a, params)

            det = jax.vmap(per_image)(gray, quads, valid, areas)

            corners = det.corners.reshape(B * D, 4, 2)
            ids = det.ids.reshape(B * D)
            ok = det.valid.reshape(B * D)
            im_of = jnp.repeat(jnp.arange(B), D)

            def solve(c, K, dist):
                return P_.solve_marker_pose(c, K, dist, marker_size, lm_iters=lm_iters)

            R, t, err = jax.vmap(solve)(corners, Ks[im_of], dists[im_of])
            finite = (
                jnp.isfinite(err)
                & jnp.all(jnp.isfinite(R), axis=(1, 2))
                & jnp.all(jnp.isfinite(t), axis=1)
            )
            return corners, ids, ok & finite, R, t, err

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
    mesh=None,
    verbose: bool = True,
) -> dict:
    """Run the hybrid perception pipeline over all images.

    ``mesh``: optional ``jax.sharding.Mesh`` — the batch axis of the device
    program is sharded across its first axis (data parallelism over images,
    SURVEY.md §2.3; the reference fans out a multiprocessing pool instead).
    Returns the reference edge dict (cam.py:120-124 schema).
    """
    import jax.numpy as jnp

    from .ops import detect as D_
    from .ops.dictionary import get_dictionary, marker_bits_table

    refine_kind = resolve(CORNER_REFINE, corner_refine, "corner_refine")
    resolve(PNP_FLAGS, flags, "flags")  # always the IPPE-square path today
    _, n_bits = get_dictionary(aruco)
    table = jnp.asarray(marker_bits_table(aruco))

    params = detector_params or D_.DetectorParams()
    params = params._replace(corner_refine=refine_kind)

    out: dict = {}
    B = batch_size
    total_det = 0

    def prepare(start):
        """Host stage: decode, preprocess, candidate extraction."""
        batch_files = im_filenames[start : start + B]
        batch_cams = cams[start : start + B]
        images = load_images(batch_files)
        nb = len(batch_files)
        if nb < B:  # pad the tail batch
            images = np.concatenate([images, np.repeat(images[-1:], B - nb, axis=0)])
            batch_cams = batch_cams + [batch_cams[-1]] * (B - nb)
        gray = host_preprocess(images, float(brightness), float(contrast))
        quads, valid, areas = host_candidates(gray, params)
        Ks = np.stack([np.asarray(c.intrinsics, np.float32) for c in batch_cams])
        dists = np.stack(
            [
                np.pad(np.atleast_1d(c.distortion).astype(np.float32), (0, 14))[:14]
                for c in batch_cams
            ]
        )
        return batch_files, batch_cams, nb, gray, quads, valid, areas, Ks, dists

    def dispatch(prep):
        """Device stage: returns unfetched device arrays (async)."""
        batch_files, batch_cams, nb, gray, quads, valid, areas, Ks, dists = prep
        H, W = gray.shape[1:3]
        Q = quads.shape[1]
        run = _get_pipeline(
            ("hybrid", H, W, B, Q, n_bits, params, lm_iters, float(marker_size)),
            lambda: _build_hybrid(B, Q, n_bits, params, lm_iters, float(marker_size)),
        )
        dev_args = [gray, quads, valid, areas, Ks, dists]
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            dev_args = [
                jax.device_put(a, NamedSharding(mesh, P(axis, *([None] * (np.ndim(a) - 1)))))
                for a in dev_args
            ]
        else:
            dev_args = [jnp.asarray(a) for a in dev_args]
        return (batch_files, batch_cams, nb, run(*dev_args, table))

    def consume(handle, batch_index):
        """Fetch + unpack one batch's results into the edge dict."""
        nonlocal total_det
        batch_files, batch_cams, nb, result = handle
        corners, ids, ok, R, t, err = result
        corners = np.asarray(corners)
        ids = np.asarray(ids)
        ok = np.asarray(ok)
        R = np.asarray(R, np.float64)
        t = np.asarray(t, np.float64)
        err = np.asarray(err)
        Dcap = params.max_detections
        for j in range(nb):
            fn = batch_files[j]
            cam = batch_cams[j]
            for k in range(Dcap):
                e = j * Dcap + k
                if not ok[e]:
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
            print(f"  batch {batch_index}: {nb} images, {int(ok[: nb * Dcap].sum())} detections")

    # Software pipeline: while the device chews on batch N, the host decodes
    # and extracts candidates for batch N+1 (dispatch is async; the fetch in
    # consume() is the only sync point).
    pending = None
    for bi, start in enumerate(range(0, len(im_filenames), B)):
        handle = dispatch(prepare(start))
        if pending is not None:
            consume(*pending)
        pending = (handle, bi)
    if pending is not None:
        consume(*pending)
    if verbose:
        n_images = len({v["im_filename"] for v in out.values()})
        print(f"Found markers in {n_images} images ({total_det} detections).")
    return out

"""Batched perception driver: images -> camera-marker edge dict.

The reference fans one OpenCV pipeline per image over a multiprocessing pool
(vican/cam.py:190-265).  Here the work splits by what each processor is good
at, in one of four pipeline modes (auto-selected; see
:func:`estimate_pose_batched`):

- ``"roi"`` (default): the frame NEVER crosses the host link.  Threshold
  sweep (C integral-image kernel, _native/fastthresh.c, bit-packed out;
  bit-identical numpy fallback without a C toolchain) and run-based
  union-find quad extraction (_native/fastccl.c; bit-identical
  scipy.ndimage fallback) run on host; ONLY the 32 px tile UNION of the
  candidates' reach regions uploads (:mod:`vican_tpu.ops.roi` — no
  window-overlap duplication, ~0.2 MB/img vs 0.9 full-frame at 720p; set
  ``VICAN_TPU_ROI_UPLOAD=windows`` for the older shared-crop-window
  transport).  The device scatters the tiles into a zero frame, and
  refine/decode sample it through exact one-hot matmuls (MXU work instead
  of serialized gathers); dedup/PnP return one packed buffer.  Detections
  are bit-identical to the full-frame modes by the ops/roi.py exactness
  contract (full-frame fallback when a site exceeds the top tier).
- ``"device"``: the adaptive-threshold sweep (reference cam.py:147 with
  params at cam.py:132-135) runs ON DEVICE — the fused Pallas kernel on
  TPU, integral-image XLA elsewhere — and ships back only the OCCUPIED
  16x16 tiles of the bit-packed masks; refine/decode/dedup/PnP is a
  second fused device program over the device-resident frame.  Best when
  the host link is fast (PCIe) and host CPU is the scarce resource.
- ``"host"``: host threshold + full-frame upload for the detect program.
- ``"pure"``: the whole detection pipeline, including connected components,
  runs as one jitted device program (:func:`vican_tpu.ops.detect.
  detect_markers`).  Explicit-selection only: hosts without a C toolchain
  auto-resolve to ``"roi"`` through the numpy/scipy kernel stand-ins (only
  a host with neither C nor scipy falls back here automatically).

Corner convention note: corners are the *physical* marker boundary (intensity
transition midpoint).  OpenCV's detector reports quads translated by
+(0.5, 0.5) source pixels (its lattice convention); on synthetic renders our
corners land ~4x closer to ground truth (see tests/test_detect.py).
"""
from __future__ import annotations

import os
from typing import Iterable

import numpy as np

from .cam import Camera, gen_marker_uid
from .geometry import SE3
from .utils.registry import CORNER_REFINE, PNP_FLAGS, resolve

__all__ = [
    "estimate_pose_batched",
    "load_images",
    "host_preprocess",
    "host_candidates",
    "quads_from_masks",
]


def load_images(filenames: Iterable[str], grayscale: bool = False) -> np.ndarray:
    """Host JPEG decode into a uint8 (B, H, W, 3) BGR batch.

    ``grayscale=True`` decodes straight to (B, H, W) gray — ~3x faster for
    JPEG (libjpeg skips chroma upsampling + the BGR round trip; measured
    8.7 -> 2.8 ms/img at 720p).  Used when brightness == contrast == 0, so
    the color->gray preprocess is the identity transform anyway.  For
    chroma-subsampled color JPEGs libjpeg's Y channel can differ by +-1
    from cvtColor(BGR2GRAY) of the color decode; every pipeline mode shares
    this loader, so cross-mode detection equality is unaffected.
    """
    import cv2 as cv

    flag = cv.IMREAD_GRAYSCALE if grayscale else cv.IMREAD_COLOR
    ims = []
    for fn in filenames:
        im = cv.imread(fn, flag)
        if im is None:
            raise FileNotFoundError(f"could not read image: {fn}")
        ims.append(im)
    shapes = {im.shape for im in ims}
    if len(shapes) != 1:
        raise ValueError(
            f"mixed image shapes in batch: {shapes}. Cameras that declare "
            "resolution_x/y must match their image files; cameras with "
            "undeclared resolution are grouped by actual image size "
            "automatically (see estimate_pose_batched)."
        )
    return np.stack(ims)


def _probe_image_size(fn: str) -> tuple[int, int]:
    """Actual image size ``(H, W)`` from the file header (no full decode;
    falls back to a cv2 decode when PIL is unavailable)."""
    try:
        from PIL import Image
    except ImportError:
        import cv2 as cv

        im = cv.imread(fn)
        if im is None:
            raise FileNotFoundError(f"could not read image: {fn}") from None
        return im.shape[:2]

    with Image.open(fn) as im:
        w, h = im.size
        try:
            orientation = im.getexif().get(0x0112, 1)
        except Exception:
            orientation = 1
    # cv2.imread applies EXIF orientation when decoding; 90-degree
    # orientations (5-8) swap the decoded H/W relative to the header size,
    # so the probe must match or a rotated JPEG in a resolution-less rig
    # would group under a transposed key and fail with a mixed-shape error
    if orientation in (5, 6, 7, 8):
        w, h = h, w
    return (h, w)


def host_preprocess(images: np.ndarray, brightness: float, contrast: float) -> np.ndarray:
    """Reference contrast/brightness + BGR grayscale, on host (uint8 out).

    Bit-matches cam.py:137-145: int16 scale, clip, uint8 truncation, then
    OpenCV BGR2GRAY.
    """
    import cv2 as cv

    if contrast == 0 and brightness == 0:
        # the transform is the identity on uint8 (x + 0, clip, truncate);
        # skipping the float32 round trip saves ~12 ms/image on one core
        x = images
    else:
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
    # Solid-enough blob OR a ring/outline: large markers hollow under the
    # adaptive threshold (window << border-ring thickness leaves only a
    # ~win/2 band along each edge), so their component is a thin square
    # annulus whose fill ratio drops with marker size.  An annulus of
    # thickness t has area ~ t * perimeter — accept components at least
    # 1 px "thick" along their quad outline, but ONLY at the quad sizes
    # where hollowing can occur (ring thickness = side/6 exceeding the
    # largest window), so ordinary-size junk keeps facing the fill gate
    # (OpenCV's contour extraction has no fill gate; decode is the backstop).
    perim = edge_len.sum(-1)
    min_hollow_side = 4.0 * max(params.win_sizes)
    outline = (areas >= np.maximum(perim, 1.0)) & (
        quad_area >= min_hollow_side * min_hollow_side
    )
    return (
        (areas >= params.min_area)
        & (edge_len.min(-1) >= 5.0)
        & inside
        & convex
        & ((fill > 0.2) | outline)
    )


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain over integer points sorted lexicographically
    by (x, y) (exact integer cross products; collinear points dropped)."""
    def half(points):
        out: list = []
        for px, py in points:
            while len(out) >= 2:
                ax, ay = out[-2]
                bx, by = out[-1]
                if (bx - ax) * (py - ay) - (by - ay) * (px - ax) <= 0:
                    out.pop()
                else:
                    break
            out.append((px, py))
        return out

    if len(pts) <= 2:
        return pts
    plist = [(int(x), int(y)) for x, y in pts]  # python ints: ~4x faster loop
    lower = half(plist)
    upper = half(plist[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def _max_area_quad(hull: np.ndarray) -> np.ndarray:
    """Maximum-area quadrilateral with vertices on the convex hull: for
    every vertex pair (a, b) take the farthest hull point on each side of
    the a->b line (the max-area completion for that diagonal/edge), keep
    the best.  O(h^2) over the (small) hull."""
    h = len(hull)
    best_area = -1.0
    best = hull[[0, 0, 0, 0]] if h < 4 else None
    for i in range(h - 1):
        dx = hull[:, 0] - hull[i, 0]
        dy = hull[:, 1] - hull[i, 1]
        ex, ey = dx[i + 1:], dy[i + 1:]  # a->b vectors for every j > i
        cr = dx[:, None] * ey[None, :] - dy[:, None] * ex[None, :]
        up, dn = cr.argmax(0), cr.argmin(0)
        cols = np.arange(cr.shape[1])
        areas = np.abs(cr[up, cols]) + np.abs(cr[dn, cols])
        jr = int(np.argmax(areas))
        if areas[jr] > best_area:
            best_area = float(areas[jr])
            best = np.stack([hull[i], hull[up[jr]], hull[i + 1 + jr],
                             hull[dn[jr]]])
    return np.asarray(best, np.float64)


def _refit_degenerate_quad(mask, quad, area, H, W, conn4=False):
    """Re-fit a candidate whose farthest-point quad degenerated.

    At extreme oblique view angles a marker's long SIDE exceeds its
    diagonal, so "farthest from p1" lands on the adjacent long-side corner
    instead of the diagonal one and two extracted corners collapse (the
    min-edge gate then rejects the candidate outright).  OpenCV escapes
    through the AprilTag quad detector's gradient clustering
    (reference cam.py:147); the geometric equivalent here is the
    MAXIMUM-AREA QUADRILATERAL ON THE COMPONENT'S CONVEX HULL, which
    recovers the true corners to ~1 px on these shapes.  Shared by the C
    and scipy extractor paths (operates downstream of both); the decode
    stage remains the backstop, so a bad re-fit can never produce a false
    id.  Returns the re-fit quad (float64 (4, 2)) or None.
    """
    from scipy import ndimage

    x0, x1 = float(quad[:, 0].min()), float(quad[:, 0].max())
    y0, y1 = float(quad[:, 1].min()), float(quad[:, 1].max())
    margin = 32  # the expansion loop below widens if the component is clipped
    for _expand in range(4):
        ax0, ay0 = max(0, int(x0) - margin), max(0, int(y0) - margin)
        ax1, ay1 = min(W, int(x1) + margin + 1), min(H, int(y1) + margin + 1)
        crop = mask[ay0:ay1, ax0:ax1]
        # connectivity must match the slot class, or the area check can
        # never pass: split slots carry 4-connected sub-components whose
        # area is a strict subset of their 8-connected parent
        structure = None if conn4 else np.ones((3, 3), np.int32)
        lab, _n = ndimage.label(crop, structure=structure)
        cx, cy = int(quad[0, 0]) - ax0, int(quad[0, 1]) - ay0
        if not (0 <= cy < lab.shape[0] and 0 <= cx < lab.shape[1]):
            return None
        lid = lab[cy, cx]
        if lid == 0:
            return None
        sel = lab == lid
        if int(sel.sum()) == int(area):
            break  # full component inside the crop
        # Widen ONLY when the component is clipped by a crop edge that is
        # not also an image edge; any other area mismatch means the corner
        # pixel landed in a different component — give up (rare).
        clipped = ((ay0 > 0 and sel[0].any())
                   or (ay1 < H and sel[-1].any())
                   or (ax0 > 0 and sel[:, 0].any())
                   or (ax1 < W and sel[:, -1].any()))
        if not clipped:
            return None
        margin *= 2
    else:
        return None
    ys, xs = np.nonzero(sel)  # row-major: ys sorted, xs ascending per row
    rows, first = np.unique(ys, return_index=True)
    last = np.r_[first[1:], ys.size] - 1
    # hull vertices are per-row x-extremes; integer coords, global frame
    pts = np.unique(np.concatenate([
        np.stack([xs[first] + ax0, rows + ay0], 1),
        np.stack([xs[last] + ax0, rows + ay0], 1),
    ]), axis=0)
    hull = _convex_hull(pts)
    if len(hull) < 4:
        return None
    return _max_area_quad(hull.astype(np.float64))


def _get_ccl():
    from ._native import get_fastccl

    return get_fastccl()


def quads_from_masks(fg: np.ndarray, params) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Union-find quad candidates from a (B, Wn, H, W) foreground batch.

    Returns ``(quads (B, Q, 4, 2) float32, valid (B, Q) bool, areas)`` with
    ``Q = Wn * (max_candidates + max_candidates_4conn)``; quads are
    clockwise-wound and gated.  Production path is the C kernel
    (fastccl.c, split-capable packed2 entry, fed bit-packed rows); without
    a C toolchain the scipy.ndimage extractor below reproduces it
    bit-for-bit, 4-connected split candidates included — both branches
    return the SAME slot layout and detections.
    """
    ccl = _get_ccl()
    B = fg.shape[0]
    H, W = fg.shape[2], fg.shape[3]
    K2 = params.max_candidates_4conn
    max_area = params.max_area_rate * H * W
    if ccl is not None and hasattr(ccl, "quad_candidates_packed2"):
        Wb = -(-W // 8)

        def extract(b, wi):
            packed = np.packbits(fg[b, wi], axis=-1, bitorder="little")
            return ccl.quad_candidates_packed2(
                np.ascontiguousarray(packed), H, W, Wb,
                params.max_candidates, K2, params.min_area, max_area)

    else:
        def extract(b, wi):
            return _candidates_scipy(fg[b, wi], params.max_candidates, K2,
                                     params.min_area, max_area)

    return _collect_window_candidates(B, fg.shape[1], H, W, params, extract,
                                      K2=K2, mask_of=lambda b, wi: fg[b, wi])


def _candidates_scipy(fg: np.ndarray, K: int, K2: int, min_area, max_area):
    """scipy.ndimage fallback for fastccl.c — bit-identical by construction.

    Mirrors the C kernel's semantics exactly (see fastccl.c for why each
    step is tie-break-safe):

    - component numbering: ``ndimage.label`` assigns labels in raster-scan
      order of first encounter, matching the C slot order (roots keep the
      minimum run index);
    - top-K: the C ``top_k`` is replicated literally — no sort at all when
      at most K candidates pass the area filter (scan order kept), else a
      first-max selection sort whose swaps are tie-UNstable;
    - corners: the C kernel evaluates run ENDPOINTS in (y, x) scan order
      with strict comparisons; a full pixel sweep in the same order picks
      the same points because every selection metric (squared distance,
      signed cross product) is convex/linear in x along a run — an interior
      pixel can never strictly beat both endpoints, and first-max/argmax
      tie-breaking coincides;
    - splits: 4-connected components that are strict subsets of their
      8-connected parent (area4 < area8), as in quad_candidates_packed2.
    """
    from scipy import ndimage

    fg = np.ascontiguousarray(fg, dtype=np.uint8)
    lab8, n8 = ndimage.label(fg, structure=np.ones((3, 3), np.int32))
    corners = np.zeros((K + K2, 4, 2), np.float32)
    areas_out = np.zeros((K + K2,), np.int32)
    lo, hi = int(min_area), int(max_area)  # C casts both to int32

    def emit(lab, keep_ids, Kslots, base):
        objs = ndimage.find_objects(lab)
        for a, lid in enumerate(keep_ids[:Kslots]):
            sl = objs[lid - 1]
            ys, xs = np.nonzero(lab[sl] == lid)  # (y, x) scan order
            xs = xs.astype(np.float64) + sl[1].start
            ys = ys.astype(np.float64) + sl[0].start
            area = xs.shape[0]
            cx = xs.sum() / area
            cy = ys.sum() / area
            i1 = np.argmax((xs - cx) * (xs - cx) + (ys - cy) * (ys - cy))
            p1x, p1y = xs[i1], ys[i1]
            i2 = np.argmax((xs - p1x) * (xs - p1x) + (ys - p1y) * (ys - p1y))
            p2x, p2y = xs[i2], ys[i2]
            dx, dy = p2x - p1x, p2y - p1y
            c = (xs - p1x) * dy - (ys - p1y) * dx
            i3, i4 = np.argmax(c), np.argmin(c)
            corners[base + a] = [[p1x, p1y], [xs[i3], ys[i3]],
                                 [p2x, p2y], [xs[i4], ys[i4]]]
            areas_out[base + a] = area
        return min(len(keep_ids), Kslots)

    def top_k_c(ids, areas, Kslots):
        # The C top_k sorts ONLY when more than K candidates pass the
        # filter (otherwise scan order is kept), and its selection sort
        # swaps (first-max, swap-unstable) — replicate both exactly.
        ids = list(ids)
        if len(ids) > Kslots:
            for a in range(Kslots):
                best = a
                for b in range(a + 1, len(ids)):
                    if areas[ids[b]] > areas[ids[best]]:
                        best = b
                ids[a], ids[best] = ids[best], ids[a]
            ids = ids[:Kslots]
        return np.asarray(ids, np.int64) + 1  # 0-based -> label ids

    area8 = np.bincount(lab8.ravel(), minlength=n8 + 1)[1:]
    kept8 = np.nonzero((area8 >= lo) & (area8 <= hi))[0]
    nkeep8 = emit(lab8, top_k_c(kept8, area8, K), K, 0)

    nkeep4 = 0
    if K2 > 0:
        lab4, n4 = ndimage.label(fg)  # default structure = 4-connectivity
        if n4 > n8:  # otherwise every 4-conn component == its 8-conn parent
            area4 = np.bincount(lab4.ravel(), minlength=n4 + 1)[1:]
            # 8-conn parent area looked up at each 4-component's first pixel
            flat4 = lab4.ravel()
            idx = np.nonzero(flat4)[0]
            _, firsts = np.unique(flat4[idx], return_index=True)  # labels 1..n4
            parent8 = area8[lab8.ravel()[idx[firsts]] - 1]
            kept4 = np.nonzero(
                (area4 >= lo) & (area4 <= hi) & (area4 < parent8)
            )[0]
            nkeep4 = emit(lab4, top_k_c(kept4, area4, K2), K2, K)

    return corners.tobytes(), areas_out.tobytes(), nkeep8, nkeep4


def _collect_window_candidates(B, Wn, H, W, params, extract, K2=0,
                               mask_of=None):
    """Shared tail of the C candidate extractors: collect per-(image,
    window) quads into fixed slots, enforce clockwise winding, apply the
    validity gates.  ``extract(b, wi) -> (corners_bytes, area_bytes, n)``
    or, with ``K2 > 0`` extra 4-conn split slots per window,
    ``-> (corners_bytes, area_bytes, n8, n4)``.  ``mask_of(b, wi)`` (when
    given) provides the window's foreground mask so gate-rejected
    candidates can be re-fit (see :func:`_refit_degenerate_quad`)."""
    K = params.max_candidates
    Ks = K + K2
    quads = np.zeros((B, Wn * Ks, 4, 2), np.float32)
    areas = np.zeros((B, Wn * Ks), np.float32)
    valid = np.zeros((B, Wn * Ks), bool)
    for b in range(B):
        for wi in range(Wn):
            out = extract(b, wi)
            c_bytes, a_bytes = out[0], out[1]
            q = np.frombuffer(c_bytes, np.float32).reshape(Ks, 4, 2)
            a = np.frombuffer(a_bytes, np.int32)
            sl = wi * Ks
            quads[b, sl : sl + Ks] = q
            areas[b, sl : sl + Ks] = a
            valid[b, sl : sl + out[2]] = True
            if K2 > 0:
                valid[b, sl + K : sl + K + out[3]] = True

    # enforce clockwise winding (image coords): positive shoelace
    x = quads[..., 0]
    y = quads[..., 1]
    shoelace = np.sum(x * np.roll(y, -1, -1) - np.roll(x, -1, -1) * y, axis=-1)
    flip = shoelace < 0
    quads[flip] = quads[flip][:, [0, 3, 2, 1]]

    emitted = valid
    valid = emitted & _quad_gates(quads, areas, H, W, params)

    if mask_of is not None:
        # Degenerate-extraction recovery: an extractor-emitted candidate
        # that the shape gates reject may be an extreme-oblique marker
        # whose farthest-point corners collapsed; re-fit the max-area
        # hull quad and re-gate (decode is the backstop downstream).
        # Trigger ONLY on the degeneracy signature — a collapsed corner
        # pair (tiny edge) or a non-convex corner order — so ordinary
        # fill-gate junk never pays the re-fit (scipy label on a crop).
        edges_ = np.roll(quads, -1, axis=-2) - quads
        elen_ = np.linalg.norm(edges_, axis=-1)
        enx_ = np.roll(edges_, -1, axis=-2)
        cr_ = edges_[..., 0] * enx_[..., 1] - edges_[..., 1] * enx_[..., 0]
        degen = (elen_.min(-1) < 5.0) | ~((cr_ > 0).all(-1) | (cr_ < 0).all(-1))
        masks: dict = {}  # several rejects often share a window: unpack once
        for b, s in zip(*np.nonzero(emitted & ~valid & degen)):
            wi = s // Ks
            if (b, wi) not in masks:
                masks[(b, wi)] = mask_of(b, wi)
            q2 = _refit_degenerate_quad(
                masks[(b, wi)], quads[b, s], areas[b, s], H, W,
                conn4=(s % Ks) >= K)  # split slots hold 4-conn components
            if q2 is None:
                continue
            sh = np.sum(q2[:, 0] * np.roll(q2[:, 1], -1)
                        - np.roll(q2[:, 0], -1) * q2[:, 1])
            if sh < 0:
                q2 = q2[[0, 3, 2, 1]]
            if _quad_gates(q2[None, None], areas[b, s][None, None],
                           H, W, params)[0, 0]:
                quads[b, s] = q2
                valid[b, s] = True
    return quads, valid, areas


def quads_from_packed_masks(packed: np.ndarray, H: int, W: int, params):
    """C union-find quad candidates from bit-packed (B, Wn, H, Wb) masks.

    Same output contract as :func:`quads_from_masks`, but the ~8x-larger
    unpacked mask is never materialized (``np.unpackbits`` measured
    ~17 ms/image at 720p x 7 windows on one core); the C kernel reads the
    packed bits directly and skips empty bytes.
    """
    ccl = _get_ccl()
    if ccl is None or not hasattr(ccl, "quad_candidates_packed"):
        fg = np.unpackbits(packed, axis=-1, bitorder="little")[..., :W]
        return quads_from_masks(fg[:, :, :H], params)

    B, Wn, Hrows, Wb = packed.shape
    K2 = params.max_candidates_4conn

    def mask_of(b, wi):  # unpacked lazily, only for gate-rejected re-fits
        return np.unpackbits(
            packed[b, wi, :H], axis=-1, bitorder="little")[:, :W]

    if K2 > 0 and hasattr(ccl, "quad_candidates_packed2"):
        return _collect_window_candidates(
            B, Wn, H, W, params,
            lambda b, wi: ccl.quad_candidates_packed2(
                np.ascontiguousarray(packed[b, wi, :H]), H, W, Wb,
                params.max_candidates, K2, params.min_area,
                params.max_area_rate * H * W,
            ),
            K2=K2,
            mask_of=mask_of,
        )
    return _collect_window_candidates(
        B, Wn, H, W, params,
        lambda b, wi: ccl.quad_candidates_packed(
            np.ascontiguousarray(packed[b, wi, :H]), H, W, Wb,
            params.max_candidates, params.min_area,
            params.max_area_rate * H * W,
        ),
        mask_of=mask_of,
    )


def _packed_from_tiles(sel, payload, Hp, Wp_bytes):
    """Host: rebuild the bit-packed (B, Wn, Hp, Wb) mask batch from
    compacted tiles (exact — unselected tiles are all-background)."""
    B, Wn, K = sel.shape
    payload = payload.reshape(B, Wn, K, _TILE_H * _TILE_B)
    Ht, Wt = Hp // _TILE_H, Wp_bytes // _TILE_B
    full = np.zeros((B, Wn, Ht * Wt, _TILE_H * _TILE_B), np.uint8)
    np.put_along_axis(full, sel[..., None], payload, axis=2)
    full = full.reshape(B, Wn, Ht, Wt, _TILE_H, _TILE_B)
    return full.transpose(0, 1, 2, 4, 3, 5).reshape(B, Wn, Hp, Wp_bytes)


def _mask_packed_width(packed: np.ndarray, W: int) -> np.ndarray:
    """Zero all bits at columns >= W in place (bucket-padded columns carry
    replicate-edge threshold garbage that must not join real components)."""
    full_bytes = W // 8
    if W % 8:
        packed[..., full_bytes] &= (1 << (W % 8)) - 1
        packed[..., full_bytes + 1 :] = 0
    else:
        packed[..., full_bytes:] = 0
    return packed


def _get_thresh():
    from ._native import get_fastthresh

    return get_fastthresh()


def host_candidates(gray: np.ndarray, params) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-threshold path: adaptive-mean sweep + union-find CCL, (B, H, W).

    Used by the ``"roi"`` mode (which never ships the frame) and the
    ``"host"`` mode.  The production path is the C integral-image kernel
    (_native/fastthresh.c): one integral image feeds every window size and
    the masks come out bit-packed for the packed CCL reader — ~4x faster
    than a cv2.boxFilter sweep and without materializing (B, Wn, H, W)
    masks.  Its integer compare is exactly the device threshold's f32 test
    (see fastthresh.c).  Without a C toolchain, a numpy integral image
    applies the IDENTICAL integer compare (no cv2 dependency, no float
    tie divergence), so every candidate path agrees bit-for-bit.
    """
    B, H, W = gray.shape
    Wn = len(params.win_sizes)
    th = _get_thresh()
    Wb = -(-W // 8)
    wins = tuple(int(w) for w in params.win_sizes)
    packed = np.empty((B, Wn, H, Wb), np.uint8)
    if th is not None:
        for b in range(B):
            buf = th.threshold_pack(
                np.ascontiguousarray(gray[b]), H, W, wins,
                float(params.thresh_const),
            )
            packed[b] = np.frombuffer(buf, np.uint8).reshape(Wn, H, Wb)
    else:
        for b in range(B):
            packed[b] = _threshold_pack_numpy(gray[b], wins, params.thresh_const)
    return quads_from_packed_masks(packed, H, W, params)


def _threshold_pack_numpy(g: np.ndarray, wins, C) -> np.ndarray:
    """numpy fallback for fastthresh.c — identical masks by construction.

    One replicate-padded int32 integral image sweeps every window size;
    the integral-C fast path uses the same exact integer compare
    ``(g + C) * win^2 <= boxsum`` (see fastthresh.c for the equivalence
    proof against the device program's float32 test).
    """
    H, W = g.shape
    R = max(w // 2 for w in wins)
    gp = np.pad(g, R, mode="edge").astype(np.int32)
    ii = np.zeros((H + 2 * R + 1, W + 2 * R + 1), np.int32)
    np.cumsum(np.cumsum(gp, axis=0), axis=1, out=ii[1:, 1:])
    out = np.empty((len(wins), H, -(-W // 8)), np.uint8)
    gi = g.astype(np.int32)
    c_int = float(C).is_integer()
    for wi, win in enumerate(wins):
        r = win // 2
        a, b = R - r, R + r + 1  # padded-coord offsets of the window box
        s = (ii[b : b + H, b : b + W] - ii[a : a + H, b : b + W]
             - ii[b : b + H, a : a + W] + ii[a : a + H, a : a + W])
        if c_int:
            fg = (gi + int(C)) * (win * win) <= s
        else:
            fg = gi.astype(np.float64) <= s.astype(np.float64) / (win * win) - C
        out[wi] = np.packbits(fg, axis=1, bitorder="little")
    return out


_PIPELINE_CACHE: dict = {}
_DOM_INDEX: dict = {}  # base key -> [(caps_c, extra_c, cache_key), ...]


def _get_pipeline(key, builder):
    if key not in _PIPELINE_CACHE:
        _PIPELINE_CACHE[key] = builder()
    return _PIPELINE_CACHE[key]


def _get_dominating_pipeline(family, base_key, caps, extra, build):
    """Find — or compile — a crop-detect program whose STATIC caps dominate
    this batch's tight caps, so candidate-count variation between batches
    stops forcing recompiles (each one costs minutes through a
    remote-compile tunnel; VERDICT r3 weak #4).

    ``caps``: tight per-tier ``(T, Ncap)``; ``extra``: the tile-payload
    capacity (0 when the transport has none).  A cached program is reused
    when it contains every needed tier at ``Ncap_c >= Ncap`` and
    ``extra_c >= extra`` — the dispatcher pads the inputs up to the static
    caps with trash-slot columns, and the dynamic-trip chunk loop inside
    the program (see ``_build_roi_detect``) skips the padding, so reuse
    costs nothing but the (negligible) meta upload padding.  On a miss the
    new program's caps take the elementwise max over the request AND every
    cached program, with 2x headroom, so cap growth converges in O(log)
    compiles.  ``build(caps_c, extra_c) -> run``; returns
    ``(run, caps_c, extra_c)``.
    """
    idx_key = (family,) + base_key
    idx = [e for e in _DOM_INDEX.get(idx_key, ())
           if e[2] in _PIPELINE_CACHE]  # drop entries behind a cache clear
    need = dict(caps)
    best = None
    for caps_c, extra_c, ckey in idx:
        cd = dict(caps_c)
        if extra_c >= extra and all(
            T in cd and cd[T] >= N for T, N in need.items()
        ):
            waste = sum(cd.values()) + extra_c
            if best is None or waste < best[0]:
                best = (waste, caps_c, extra_c, ckey)
    if best is not None:
        _DOM_INDEX[idx_key] = idx
        return _PIPELINE_CACHE[best[3]], best[1], best[2]

    from .ops.roi import _round_up

    merged = dict(caps)
    extra_c = extra
    for caps_prev, extra_prev, _ in idx:
        for T, N in caps_prev:
            merged[T] = max(merged.get(T, 0), N)
        extra_c = max(extra_c, extra_prev)
    caps_c = tuple(
        (T, _round_up(max(2 * N, 128), 64)) for T, N in sorted(merged.items())
    )
    if extra_c:
        # NO headroom on the tile-payload cap: unlike meta columns (56 B
        # each) the padding tiles ship as real bytes every batch (1 KB
        # each); tile counts vary little batch-to-batch, and growth costs
        # one merged recompile via the dominance miss path
        extra_c = _round_up(extra_c, 512)
    ckey = idx_key + (caps_c, extra_c)
    run = _get_pipeline(ckey, lambda: build(caps_c, extra_c))
    idx.append((caps_c, extra_c, ckey))
    _DOM_INDEX[idx_key] = idx
    return run, caps_c, extra_c


def _pad_tier_metas(caps_tight, metas, caps_c, BQ):
    """Pad per-tier meta arrays up to a dominating program's static caps
    (in ITS tier order; absent tiers become all-trash columns) and compute
    the used-chunk counts its dynamic loop will run.  Trash columns follow
    the ops/roi padding convention: zeros with slot row 10 = ``BQ`` (the
    scatter trash row) — invalid and side-effect-free by construction."""
    tight = {T: (m, N) for (T, N), m in zip(caps_tight, metas)}
    out, used = [], []
    for T, Nc in caps_c:
        if T in tight:
            m, N = tight[T]
            if Nc > N:
                pad = np.zeros((14, Nc - N), np.float32)
                pad[10] = BQ
                m = np.concatenate([m, pad], axis=1)
            used.append(-(-N // _tier_chunk(T, Nc)))
        else:
            m = np.zeros((14, Nc), np.float32)
            m[10] = BQ
            used.append(0)
        out.append(m)
    return out, np.asarray(used, np.int32)


def _build_threshold(B, H, W, params, use_pallas):
    """Device program: preprocessed gray batch -> bit-packed threshold masks.

    Returns ``(packed (B, Wn, H, ceil(W/8)) uint8, gray_f32 (B, H, W))`` —
    the float gray stays device-resident for the detection program, so the
    frame crosses the host link exactly once in each direction (uint8 up,
    W/8 packed mask bytes per window down).
    """
    import jax
    import jax.numpy as jnp

    from .ops import detect as D_

    Wn = len(params.win_sizes)
    Wp = -(-W // 8) * 8
    Hp = -(-H // 8) * 8

    @jax.jit
    def run(gray_u8):
        gray = gray_u8.astype(jnp.float32)
        if use_pallas:
            from .ops.pallas.threshold import multi_threshold

            def one(g):
                gp = jnp.pad(g, ((0, Hp - H), (0, 0)), mode="edge") if Hp != H else g
                return multi_threshold(gp, params.win_sizes, params.thresh_const)[:, :H, :] > 0.5

            # lax.map, not vmap: pallas_call ANY-space operands can't batch
            fgs = jax.lax.map(one, gray)
        else:
            fgs = jax.vmap(
                lambda g: jnp.stack(
                    [D_.adaptive_threshold(g, w, params.thresh_const) for w in params.win_sizes]
                )
            )(gray)
        if Wp != W:
            fgs = jnp.pad(fgs, ((0, 0), (0, 0), (0, 0), (0, Wp - W)))
        # bit-pack along W, little-endian within bytes (np.unpackbits order)
        bits = fgs.reshape(B, Wn, H, Wp // 8, 8)
        weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
        packed = jnp.sum(bits.astype(jnp.int32) * weights, axis=-1).astype(jnp.uint8)
        return packed, gray

    return run


def _bucket_hw(H: int, W: int) -> tuple[int, int]:
    """Round (H, W) up to the shape-bucket grid (VICAN_TPU_SHAPE_BUCKET,
    default 128; <=1 disables).

    Device programs compile per shape, and a cold compile through a remote
    tunnel costs minutes — bucketing means a new rig resolution shares the
    compiled programs of its bucket.  Images are edge-replicate padded to
    the bucket, which is EXACT: the box-filter threshold at a true-boundary
    pixel sees the same replicated values as cv.BORDER_REPLICATE on the
    unpadded image, masks are cropped back to the true size before quad
    extraction, and bilinear sampling beyond the true edge reads the same
    replicated edge value the unpadded clamp would.  (The pure-device mode
    keeps exact shapes: its on-device gates would see bucket bounds.)
    """
    q = int(os.environ.get("VICAN_TPU_SHAPE_BUCKET", 128))
    if q <= 1:
        return H, W
    return -(-H // q) * q, -(-W // q) * q


_TILE_H = 16  # mask-compaction tile: 16 rows x 16 px (2 packed bytes)
_TILE_B = 2


def _tile_grid(H, W):
    """Padded byte-grid / tile-grid dims for a (H, W) mask."""
    Wb = -(-W // 8)  # packed bytes per row (threshold pads W to 8)
    Hp = -(-H // _TILE_H) * _TILE_H
    Wb2 = -(-Wb // _TILE_B) * _TILE_B
    return Hp, Wb2, Hp // _TILE_H, Wb2 // _TILE_B


def _tile_capacity(H, W, params) -> int:
    _, _, Ht, Wt = _tile_grid(H, W)
    n_tiles = Ht * Wt
    K = -(-max(32, int(n_tiles * params.mask_tile_rate)) // 4) * 4
    # K*32 stays a multiple of 128 (transfer layout) — but never exceed the
    # grid: order[..., :K] silently clamps to n_tiles and the payload
    # reshape would then fail at trace time (small frames, bucketing off,
    # or mask_tile_rate ~ 1)
    return min(n_tiles, K)


def _build_threshold_compact(B, H, W, params, use_pallas):
    """Device program: gray batch -> tile-compacted bit-packed masks.

    The full packed masks are ~W*H/8 bytes per window per image — the
    dominant D2H cost on a slow host link (VERDICT r2 item 2).  Markers
    occupy a small fraction of most frames (~12% of 16x16 tiles on the
    bench scene), so the program ships only the OCCUPIED tiles: per
    (image, window), the payload is ``K = mask_tile_rate * n_tiles`` tiles
    of 32 bytes plus their int32 indices and an occupancy count — a ~4-8x
    cut at the default rate.  Exactness is preserved: dropped tiles are
    all-background, and when a busy frame overflows K the caller falls back
    to the full-mask program (:func:`_build_threshold`) for that batch.

    Returns ``(sel (B, Wn, K) int32, payload (B, Wn, K*32) uint8 — flat so
    the transfer layout does not pad a small minor dim, see below —
    counts (B, Wn) int32, gray_f32)``.
    """
    import jax
    import jax.numpy as jnp

    full = _build_threshold(B, H, W, params, use_pallas)
    Hp, Wb2, Ht, Wt = _tile_grid(H, W)
    K = _tile_capacity(H, W, params)
    Wn = len(params.win_sizes)

    @jax.jit
    def run(gray_u8, h_true, w_true):
        packed, gray = full(gray_u8)
        Wb = packed.shape[-1]
        # zero the bucket-padding region (rows >= h_true, columns >=
        # w_true) BEFORE tile occupancy: replicate-pad threshold garbage
        # there is cropped on host anyway, but counting it toward tile
        # capacity can needlessly trigger the full-mask fallback (and its
        # cold compile) on frames that would otherwise fit (ADVICE r3)
        row_ok = (jnp.arange(packed.shape[2]) < h_true)[:, None]
        shift = jnp.clip(w_true - 8 * jnp.arange(Wb), 0, 8)
        col_mask = jnp.where(shift >= 8, 255, (1 << shift) - 1).astype(jnp.uint8)
        packed = packed & jnp.where(row_ok, col_mask[None, :], 0)[None, None]
        packed = jnp.pad(
            packed, ((0, 0), (0, 0), (0, Hp - H), (0, Wb2 - Wb))
        )
        tiles = packed.reshape(B, Wn, Ht, _TILE_H, Wt, _TILE_B)
        tiles = tiles.transpose(0, 1, 2, 4, 3, 5).reshape(
            B, Wn, Ht * Wt, _TILE_H * _TILE_B
        )
        occ = (tiles != 0).any(-1)
        counts = occ.sum(-1, dtype=jnp.int32)
        order = jnp.argsort(~occ, axis=-1, stable=True)  # occupied first
        sel = order[..., :K].astype(jnp.int32)
        payload = jnp.take_along_axis(tiles, sel[..., None], axis=2)
        # ship the payload with a large minor dim: a (..., 32) minor axis is
        # padded to 128 in the TPU tiled layout and would transfer 4x the
        # bytes over the (bandwidth-bound) host link
        payload = payload.reshape(B, Wn, K * _TILE_H * _TILE_B)
        return sel, payload, counts, gray

    return run


def _masks_from_tiles(sel, payload, H, W):
    """Host: reconstruct the (B, Wn, H, W) foreground batch from compacted
    tiles (exact — unselected tiles are all-background by construction).
    The production path keeps the masks bit-packed instead
    (:func:`_packed_from_tiles` + the packed C extractor)."""
    Hp, Wb2, _, _ = _tile_grid(H, W)
    packed = _packed_from_tiles(sel, payload, Hp, Wb2)
    masks = np.unpackbits(packed, axis=-1, bitorder="little")
    return masks[:, :, :H, :W]


def _pnp_block(B, params, lm_iters, marker_size, pnp_method="ippe_square"):
    """Shared tail: detections -> (R, t, reprojection error) per slot."""
    import jax
    import jax.numpy as jnp

    from .ops import pnp as P_

    D = params.max_detections

    def run(det_corners, det_ids, det_ok, Ks, dists):
        corners = det_corners.reshape(B * D, 4, 2)
        ids = det_ids.reshape(B * D)
        ok = det_ok.reshape(B * D)
        im_of = jnp.repeat(jnp.arange(B), D)

        def solve(c, K, dist):
            return P_.solve_marker_pose(c, K, dist, marker_size,
                                        lm_iters=lm_iters, method=pnp_method)

        R, t, err = jax.vmap(solve)(corners, Ks[im_of], dists[im_of])
        finite = (
            jnp.isfinite(err)
            & jnp.all(jnp.isfinite(R), axis=(1, 2))
            & jnp.all(jnp.isfinite(t), axis=1)
        )
        # ONE packed (23, B*D) f32 result buffer: six separate fetches cost
        # six ~26 ms tunnel round trips per batch, and small minor dims pad
        # to 128 in the transfer layout; transposed, the minor dim is B*D
        out = jnp.concatenate([
            corners.reshape(B * D, 8),
            ids[:, None].astype(jnp.float32),
            (ok & finite)[:, None].astype(jnp.float32),
            R.reshape(B * D, 9),
            t,
            err[:, None].astype(jnp.float32),
        ], axis=1)
        return out.T

    return run


def _unpack_pnp_result(out_t: np.ndarray):
    """Host inverse of the pnp block's packed (23, B*D) result buffer.

    Returns ``(corners (N,4,2), ids, ok, R (N,3,3), t (N,3), err)``.
    """
    out = np.asarray(out_t).T
    N = out.shape[0]
    corners = out[:, 0:8].reshape(N, 4, 2)
    ids = out[:, 8].astype(np.int64)
    ok = out[:, 9] > 0.5
    R = out[:, 10:19].reshape(N, 3, 3)
    t = out[:, 19:22]
    err = out[:, 22]
    return corners, ids, ok, R, t, err


def _build_hybrid(B, Q, n_bits, params, lm_iters, marker_size, pnp_method):
    """Device program: refine + decode + dedup + PnP from host quad candidates."""
    import jax
    import jax.numpy as jnp

    from .ops import detect as D_

    D = params.max_detections
    pnp = _pnp_block(B, params, lm_iters, marker_size, pnp_method)

    @jax.jit
    def run(gray_in, quads, valid, areas, Ks, dists, table):
        with jax.default_matmul_precision("highest"):
            gray = gray_in.astype(jnp.float32)

            def per_image(g, q, v, a):
                refined = jax.vmap(lambda qq: D_.refine_quad(g, qq, params))(q)
                ids, rots, corners, ok = D_.decode_quads(
                    g, refined, v, table, n_bits, params
                )
                return D_.dedup_and_compact(corners, ids, ok, a, params)

            det = jax.vmap(per_image)(gray, quads, valid, areas)
            return pnp(det.corners, det.ids, det.valid, Ks, dists)

    return run


def _roi_chunk_target() -> int:
    """Resolved VICAN_TPU_ROI_CHUNK — part of every crop-detect program
    cache key: the chunk width is baked into the traced program, and the
    dispatcher's used-chunk counts must be computed against the SAME
    width, so a knob change must map to a different program."""
    return int(os.environ.get("VICAN_TPU_ROI_CHUNK", 0))


def _tier_chunk(T: int, Ncap: int) -> int:
    """Chunk width of the per-tier refine/decode loop (static, shared by
    the program builder and the dispatcher's used-chunk count): a full-Ncap
    vmap would materialize the per-sample one-hot matrices for EVERY
    candidate at once (~5 MB/candidate at T=256 — GBs per batch);
    tier-scaled chunks bound the live set to a few hundred MB.  Ncap is a
    multiple of 64 by construction (ops/roi._round_up);
    ``VICAN_TPU_ROI_CHUNK`` widens chunks (fewer loop iterations — a
    latency knob for remote-tunnel hosts) while preserving divisibility."""
    CH = 64 if T <= 128 else (32 if T <= 256 else 16)
    # the knob may widen up to 4x the tier default (the per-chunk one-hot
    # live set scales with CH * T^2 — unbounded widening at the big tiers
    # would blow HBM), subject to divisibility
    limit = min(_roi_chunk_target(), 4 * CH)
    while CH * 2 <= limit and Ncap % (CH * 2) == 0:
        CH *= 2
    return CH


def _build_roi_detect(B, Q, HW, caps, n_bits, params, lm_iters, marker_size,
                      pnp_method, use_mm, from_frames=False, tile_spec=None):
    """Device program: refine + decode + dedup + PnP from ROI CROPS.

    ``caps``: tuple of ``(T, Rcap, Ncap)`` per occupied crop tier (see
    :class:`vican_tpu.ops.roi.RoiBatch`), or ``(T, Ncap)`` with
    ``from_frames=True``, where crops are ``lax.dynamic_slice``d out of
    the DEVICE-RESIDENT frame batch instead of uploaded (the device/host
    modes — the frame crossed the link for thresholding anyway, and a
    static-size slice is free while gathering refine/decode samples from
    the megapixel frame serialized at ~300 ms/batch).  Each candidate
    samples its own (T, T) crop in GLOBAL image coordinates (``CropView``)
    — via the one-hot matmul sampler on TPU (``use_mm``), so refine+decode
    rides the MXU — then results scatter back to the per-image candidate
    grid for the SAME dedup/PnP tail as the full-frame program.
    Bit-identical to the full-frame path by the ops/roi.py exactness
    contract.

    ``tile_spec=(Hp, Wp, tile, Tcap)`` selects the tile-union transport
    (:class:`vican_tpu.ops.roi.TileBatch`): ``crops_in`` is ``(tiles
    (Tcap, tile*tile) uint8, tidx (Tcap,) int32)`` and the frame batch is
    reconstructed by scattering the tiles into zeros before the SAME
    crop-view body (``from_frames`` is implied).  Un-uploaded pixels are
    zero but never sampled (reach-union coverage, ops/roi.py).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from .ops import detect as D_

    H, W = HW
    pnp = _pnp_block(B, params, lm_iters, marker_size, pnp_method)
    if tile_spec is not None:
        from_frames = True

    @jax.jit
    def run(crops_in, meta_l, nch_used, Ks, dists, table):
        with jax.default_matmul_precision("highest"):
            if tile_spec is not None:
                Hp, Wp, tile, Tcap = tile_spec
                Ht, Wt = Hp // tile, Wp // tile
                tiles_u8, tidx = crops_in
                grid = jnp.zeros((B * Ht * Wt + 1, tile * tile), jnp.uint8)
                grid = grid.at[tidx].set(tiles_u8)
                frames_f = (
                    grid[: B * Ht * Wt]
                    .reshape(B, Ht, Wt, tile, tile)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(B, Hp, Wp)
                    .astype(jnp.float32)
                )
            elif from_frames:
                frames_f = crops_in.astype(jnp.float32)
            all_ids, all_corners, all_ok, all_area, all_slot = [], [], [], [], []
            for ti, (cap, meta) in enumerate(zip(caps, meta_l)):
                if from_frames:
                    T, Ncap = cap
                else:
                    T, Rcap, Ncap = cap
                    crops_f = crops_in[ti].reshape(Rcap, T, T).astype(jnp.float32)
                gquad = meta[0:8].T.reshape(Ncap, 4, 2)
                validc = meta[8] > 0.5
                area = meta[9]
                slot = meta[10].astype(jnp.int32)
                crop_of = meta[11].astype(jnp.int32)  # crop index / image index
                origin = meta[12:14].T  # (Ncap, 2) = (ox, oy)

                def per_cand(gq, v, ci, o):
                    if from_frames:
                        crop = lax.dynamic_slice(
                            frames_f,
                            (ci, o[1].astype(jnp.int32), o[0].astype(jnp.int32)),
                            (1, T, T),
                        )[0]
                    else:
                        crop = crops_f[ci]
                    view = D_.MatmulCropView if use_mm else D_.CropView
                    im = view(crop, o[0], o[1], W, H)
                    refined = D_.refine_quad(im, gq, params)
                    bid, _rot, corners, ok = D_.decode_one(
                        im, refined, v, table, n_bits, params
                    )
                    return bid, corners, ok

                # chunked vmap (see _tier_chunk) as a DYNAMIC-trip loop:
                # only the chunks that actually hold candidates run
                # (``nch_used[ti]``, computed host-side from the tight
                # candidate count), so one program compiled at generous
                # static caps serves every batch whose counts fit — the
                # dominance-reuse machinery in the dispatchers turns the
                # one-program-per-candidate-count compile storm (minutes
                # per program through a remote-compile tunnel) into a
                # single compile per rig, with skipped padding chunks
                # (and entirely-absent tiers) costing nothing.  Untouched
                # chunk slots stay zeros, whose meta columns are
                # trash-slotted and invalid by construction (ops/roi
                # padding convention).
                CH = _tier_chunk(T, Ncap)
                nch = Ncap // CH
                chunk = lambda a: a.reshape((nch, CH) + a.shape[1:])
                cg, cv, cc, co = (chunk(gquad), chunk(validc),
                                  chunk(crop_of), chunk(origin))
                avals = jax.eval_shape(
                    jax.vmap(per_cand), cg[0], cv[0], cc[0], co[0]
                )
                acc0 = tuple(
                    jnp.zeros((nch,) + a.shape, a.dtype) for a in avals
                )

                def body(i, acc):
                    res = jax.vmap(per_cand)(
                        lax.dynamic_index_in_dim(cg, i, 0, keepdims=False),
                        lax.dynamic_index_in_dim(cv, i, 0, keepdims=False),
                        lax.dynamic_index_in_dim(cc, i, 0, keepdims=False),
                        lax.dynamic_index_in_dim(co, i, 0, keepdims=False),
                    )
                    return tuple(
                        lax.dynamic_update_index_in_dim(a, r, i, 0)
                        for a, r in zip(acc, res)
                    )

                ids, corners, ok = lax.fori_loop(
                    0, nch_used[ti], body, acc0
                )
                ids = ids.reshape(Ncap)
                corners = corners.reshape(Ncap, 4, 2)
                ok = ok.reshape(Ncap)
                all_ids.append(ids)
                all_corners.append(corners)
                all_ok.append(ok & validc)
                all_area.append(area)
                all_slot.append(slot)

            ids = jnp.concatenate(all_ids)
            corners = jnp.concatenate(all_corners)
            ok = jnp.concatenate(all_ok)
            area = jnp.concatenate(all_area)
            slot = jnp.concatenate(all_slot)

            # scatter to the (B, Q) candidate grid (padding columns carry
            # slot == B*Q, the trash row) so dedup sees the same slot order
            # and index tiebreaks as the full-frame program.  Grid dtypes
            # follow the values: under CPU-x64 tests the refined corners are
            # float64 (like the full-frame program keeps them) and an f32
            # grid here would break bit-equality with the device mode.
            G = B * Q + 1
            g_corners = jnp.zeros((G, 4, 2), corners.dtype).at[slot].set(corners)
            g_ids = jnp.zeros((G,), ids.dtype).at[slot].set(ids)
            g_ok = jnp.zeros((G,), bool).at[slot].set(ok)
            g_area = jnp.zeros((G,), area.dtype).at[slot].set(area)

            det = jax.vmap(
                lambda c, i, o, a: D_.dedup_and_compact(c, i, o, a, params)
            )(
                g_corners[: B * Q].reshape(B, Q, 4, 2),
                g_ids[: B * Q].reshape(B, Q),
                g_ok[: B * Q].reshape(B, Q),
                g_area[: B * Q].reshape(B, Q),
            )
            return pnp(det.corners, det.ids, det.valid, Ks, dists)

    return run


def _build_pure_device(B, n_bits, params, lm_iters, marker_size, pnp_method):
    """Device program: the FULL detection pipeline (threshold, CCL, quads,
    refine, decode, dedup) + PnP — no native kernels anywhere.

    Used when fastccl is unavailable (``VICAN_TPU_NO_NATIVE=1`` or no C
    toolchain).  The Pallas threshold is forced off: ``detect_markers`` is
    vmapped over the batch here and ANY-space pallas operands cannot batch.
    """
    import jax
    import jax.numpy as jnp

    from .ops import detect as D_

    params = params._replace(use_pallas_threshold=False)
    pnp = _pnp_block(B, params, lm_iters, marker_size, pnp_method)

    @jax.jit
    def run(gray_u8, Ks, dists, table):
        with jax.default_matmul_precision("highest"):
            gray = gray_u8.astype(jnp.float32)
            det = jax.vmap(lambda g: D_.detect_markers(g, table, n_bits, params))(gray)
            return pnp(det.corners, det.ids, det.valid, Ks, dists)

    return run


def _has_host_ccl() -> bool:
    """The hybrid modes need a host component-labeler: the C kernel
    (fastccl.c) or the bit-identical scipy.ndimage fallback."""
    if _get_ccl() is not None:
        return True
    try:
        import scipy.ndimage  # noqa: F401

        return True
    except ImportError:
        return False


def _resolve_mode(pipeline_mode: str) -> str:
    mode = os.environ.get("VICAN_TPU_PERCEPTION_MODE", pipeline_mode)
    if mode == "auto":
        return "roi" if _has_host_ccl() else "pure"
    if mode not in ("roi", "device", "host", "pure"):
        raise ValueError(f"unknown perception pipeline mode: {mode!r}")
    if mode in ("roi", "device", "host") and not _has_host_ccl():
        import warnings

        warnings.warn(
            "no host component labeler (fastccl/scipy); "
            "falling back to the pure-device path"
        )
        return "pure"
    return mode


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
    pipeline_mode: str = "auto",
    verbose: bool = True,
) -> dict:
    """Run the perception pipeline over all images.

    ``mesh``: optional ``jax.sharding.Mesh`` — the batch axis of the device
    programs is sharded across its first axis (data parallelism over images,
    SURVEY.md §2.3; the reference fans out a multiprocessing pool instead).

    ``pipeline_mode``: ``"auto"`` (device thresholding when the C quad
    extractor is available, else pure-device), ``"device"``, ``"host"``, or
    ``"pure"`` — see the module docstring.  Env override:
    ``VICAN_TPU_PERCEPTION_MODE``.

    Returns the reference edge dict (cam.py:120-124 schema).
    """
    import jax.numpy as jnp

    from .ops import detect as D_
    from .ops.dictionary import get_dictionary, marker_bits_table

    mode = _resolve_mode(pipeline_mode)

    # Mixed-resolution captures: the reference runs one OpenCV pipeline per
    # image (cam.py:190-265), so heterogeneous rigs are legal input.  The
    # batched device programs need uniform shapes — split into per-resolution
    # groups and merge the edge dicts.  The group key is the declared camera
    # resolution when present; cameras that declare none (e.g. DojoDataset
    # builds them with resolution_x=None — dataset.py:137-144) are keyed by
    # the ACTUAL image size from a header-only probe, so a heterogeneous
    # resolution-less rig still batches correctly (VERDICT r2 item 7).  Done
    # BEFORE the registry/dictionary-table setup so that work happens once
    # per group, not once wasted at the top level.
    res_of = lambda c: (getattr(c, "resolution_y", None), getattr(c, "resolution_x", None))
    res_keys = [res_of(c) for c in cams]
    if any(None in r for r in res_keys):
        res_keys = [
            r if None not in r else _probe_image_size(fn)
            for r, fn in zip(res_keys, im_filenames)
        ]
    if len(set(res_keys)) > 1:
        groups: dict = {}
        for key, fn, cam in zip(res_keys, im_filenames, cams):
            g = groups.setdefault(key, ([], []))
            g[0].append(fn)
            g[1].append(cam)
        out_all: dict = {}
        for (h, w), (fns, cs) in groups.items():
            if verbose:
                print(f"Resolution group {w}x{h}: {len(fns)} images")
            out_all.update(estimate_pose_batched(
                fns, cs, aruco, marker_size, corner_refine, brightness,
                contrast, flags, batch_size=batch_size, lm_iters=lm_iters,
                detector_params=detector_params, mesh=mesh,
                pipeline_mode=mode, verbose=verbose,
            ))
        return out_all

    refine_kind = resolve(CORNER_REFINE, corner_refine, "corner_refine")
    if mode == "roi" and refine_kind == "subpix":
        # cornerSubPix iterates with no bound on where it samples, so the
        # ROI exactness contract (ops/roi.py) cannot hold; the device mode
        # is exact for every refiner
        mode = "device"
    pnp_method = resolve(PNP_FLAGS, flags, "flags")
    _, n_bits = get_dictionary(aruco)
    table = jnp.asarray(marker_bits_table(aruco))

    params = detector_params or D_.DetectorParams()
    params = params._replace(corner_refine=refine_kind)
    params = D_.resolve_error_correction(params, aruco)

    out: dict = {}
    B = batch_size
    n_shards = 1
    if mesh is not None:
        # data parallelism over images: the batch splits into one sub-batch
        # per device along the mesh's first axis (SURVEY §2.3 — the
        # reference's mp.Pool per-core fan-out, cam.py:243-255); round the
        # batch up so every shard gets the same static shape
        n_shards = int(mesh.shape[mesh.axis_names[0]])
        B = -(-B // n_shards) * n_shards
    Wn = len(params.win_sizes)
    total_det = 0

    def shard(arrays):
        """Put host arrays on device, batch-sharded over the mesh if given."""
        if mesh is None:
            return [jnp.asarray(a) for a in arrays]
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        return [
            jax.device_put(a, NamedSharding(mesh, P(axis, *([None] * (np.ndim(a) - 1)))))
            for a in arrays
        ]

    def prepare(start):
        """Host stage: decode + preprocess + per-camera intrinsics."""
        batch_files = im_filenames[start : start + B]
        batch_cams = cams[start : start + B]
        # direct grayscale decode when the brightness/contrast transform is
        # the identity (it is applied pre-grayscale otherwise)
        gray_direct = float(brightness) == 0.0 and float(contrast) == 0.0
        images = load_images(batch_files, grayscale=gray_direct)
        decl = res_of(batch_cams[0])
        if None not in decl and tuple(images.shape[1:3]) != decl:
            raise ValueError(
                f"camera {batch_cams[0].id!r} declares resolution "
                f"{decl[1]}x{decl[0]} but {batch_files[0]!r} decodes to "
                f"{images.shape[2]}x{images.shape[1]} — fix the camera "
                "record, or leave resolution_x/y as None to group by "
                "actual image size"
            )
        nb = len(batch_files)
        if nb < B:  # pad the tail batch
            images = np.concatenate([images, np.repeat(images[-1:], B - nb, axis=0)])
            batch_cams = batch_cams + [batch_cams[-1]] * (B - nb)
        gray = images if gray_direct else host_preprocess(
            images, float(brightness), float(contrast))
        H, W = gray.shape[1:3]
        # shape bucketing (see _bucket_hw); exact.  The roi mode never
        # ships the frame, so its program shapes don't depend on (H, W) —
        # it pads only on its full-frame fallback.
        if mode in ("device", "host"):
            Hb, Wb = _bucket_hw(H, W)
            if (Hb, Wb) != (H, W):
                gray = np.pad(gray, ((0, 0), (0, Hb - H), (0, Wb - W)), mode="edge")
        Ks = np.stack([np.asarray(c.intrinsics, np.float32) for c in batch_cams])
        dists = np.stack(
            [
                np.pad(np.atleast_1d(c.distortion).astype(np.float32), (0, 14))[:14]
                for c in batch_cams
            ]
        )
        return batch_files, batch_cams, nb, gray, Ks, dists, (H, W)

    def dispatch_detect(meta, gray_dev, quads, valid, areas, Ks, dists, hw=None):
        """Device stage D: refine/decode/dedup/PnP (async).

        With ``hw`` (true image dims) and no mesh, candidates route through
        the crop-view program (``_build_roi_detect(from_frames=True)``):
        static dynamic-slice windows out of the device-resident frame, MXU
        matmul sampling — ~10x less detect compute than the full-frame
        gather program, bit-identical results.  Falls back to the gather
        program when a candidate fits no tier (very close range) or under
        a mesh (a traced slice across the sharded batch axis would gather).
        """
        batch_files, batch_cams, nb = meta
        Q = quads.shape[1]
        if hw is not None and mesh is None:
            from .ops.roi import build_crop_meta

            # window math against the PADDED frame dims: the resident frame
            # is bucket-padded (edge-replicate) and the old gather program
            # clamped against those dims too, so crop windows may reach into
            # the pad (replicated values == edge clamp) and the compiled
            # program is shared by every resolution in the bucket
            H, W = gray_dev.shape[1:3]
            caps, metas = build_crop_meta(quads, valid, areas, H, W, params)
            if caps is not None:
                if not caps:  # no candidates in the batch (blank frames)
                    empty = np.zeros((23, B * params.max_detections), np.float32)
                    return (batch_files, batch_cams, nb, empty)
                use_mm = D_.resolve_roi_matmul(params)
                run, caps_c, _ = _get_dominating_pipeline(
                    "cropdet",
                    (B, Q, (H, W), tuple(gray_dev.shape), n_bits, params,
                     lm_iters, float(marker_size), pnp_method, use_mm,
                     _roi_chunk_target()),
                    caps, 0,
                    lambda caps_c, _e: _build_roi_detect(
                        B, Q, (H, W), caps_c, n_bits, params, lm_iters,
                        float(marker_size), pnp_method, use_mm,
                        from_frames=True),
                )
                metas_c, nch_used = _pad_tier_metas(caps, metas, caps_c, B * Q)
                out = run(gray_dev, tuple(jnp.asarray(m) for m in metas_c),
                          jnp.asarray(nch_used), jnp.asarray(Ks),
                          jnp.asarray(dists), table)
                return (batch_files, batch_cams, nb, out)
        H, W = gray_dev.shape[1:3]
        run = _get_pipeline(
            ("hybrid", H, W, B, Q, n_bits, params, lm_iters, float(marker_size),
             pnp_method),
            lambda: _build_hybrid(B, Q, n_bits, params, lm_iters,
                                  float(marker_size), pnp_method),
        )
        dev = shard([quads, valid, areas, Ks, dists])
        return (batch_files, batch_cams, nb, run(gray_dev, *dev, table))

    # --- per-mode batch stages ------------------------------------------
    if mode == "device":
        use_pallas = D_.resolve_pallas(params)

        def stage_threshold(prep):
            """Dispatch the tile-compacted device threshold program (async)."""
            batch_files, batch_cams, nb, gray, Ks, dists, hw = prep
            Hp, Wp = gray.shape[1:3]  # bucket-padded dims
            run = _get_pipeline(
                ("thresh_tiles", Hp, Wp, B, params, use_pallas),
                lambda: _build_threshold_compact(B, Hp, Wp, params, use_pallas),
            )
            (gray_dev,) = shard([gray])
            H, W = hw
            sel, payload, counts, gray_f32 = run(gray_dev, np.int32(H), np.int32(W))
            return ((batch_files, batch_cams, nb), (sel, payload, counts),
                    gray, gray_f32, Ks, dists, hw)

        def stage_ccl(handle):
            """Fetch compacted tiles (sync), rebuild masks, extract quads in
            C, dispatch the detection program."""
            meta, tiles, gray_host, gray_f32, Ks, dists, (H, W) = handle
            Hp, Wp = gray_host.shape[1:3]
            sel, payload, counts = (np.asarray(x) for x in tiles)
            K = sel.shape[-1]
            if (counts > K).any():
                # a busy frame overflowed the tile capacity: exact fallback
                # through the full-mask program (one extra upload; rare —
                # raise DetectorParams.mask_tile_rate for textured scenes)
                run_full = _get_pipeline(
                    ("thresh", Hp, Wp, B, params, use_pallas),
                    lambda: _build_threshold(B, Hp, Wp, params, use_pallas),
                )
                (gray_dev,) = shard([gray_host])
                packed, gray_f32 = run_full(gray_dev)
                packed = np.array(packed)  # writable copy for the width mask
            else:
                Hp2, Wb2, _, _ = _tile_grid(Hp, Wp)
                packed = _packed_from_tiles(sel, payload, Hp2, Wb2)
            packed = _mask_packed_width(packed, W)
            quads, valid, areas = quads_from_packed_masks(packed, H, W, params)
            return dispatch_detect(meta, gray_f32, quads, valid, areas, Ks,
                                   dists, hw=(H, W))

    elif mode == "roi":
        from .ops.roi import build_roi_batch, build_tile_batch

        use_mm = D_.resolve_roi_matmul(params)
        # transport variant: "tiles" (default) ships the TILE-px union of
        # the candidate reach regions (no window-overlap duplication —
        # ~2.9x fewer bytes than shared windows on marker-dense scenes);
        # "windows" ships shared fixed-size crop windows
        upload = os.environ.get("VICAN_TPU_ROI_UPLOAD", "tiles")

        def _dispatch_tiles(batch_files, batch_cams, nb, tb, Q_all, HW, Ks, dists):
            H, W = HW
            if not tb.caps:  # no candidates in the batch (blank frames)
                empty = np.zeros((23, B * params.max_detections), np.float32)
                return ("roi", (batch_files, batch_cams, nb, empty))
            from .ops.roi import TILE

            Hp, Wp = tb.frame_hw
            run, caps_c, Tcap_c = _get_dominating_pipeline(
                "roitile",
                (B, Q_all, (H, W), (Hp, Wp, TILE), n_bits, params, lm_iters,
                 float(marker_size), pnp_method, use_mm, _roi_chunk_target()),
                tb.caps, tb.tiles.shape[0],
                lambda caps_c, Tcap_c: _build_roi_detect(
                    B, Q_all, (H, W), caps_c, n_bits, params, lm_iters,
                    float(marker_size), pnp_method, use_mm,
                    tile_spec=(Hp, Wp, TILE, Tcap_c)),
            )
            metas_c, nch_used = _pad_tier_metas(tb.caps, tb.metas, caps_c,
                                                B * Q_all)
            tiles, tidx = tb.tiles, tb.tidx
            if Tcap_c > tiles.shape[0]:  # pad payload to the program's cap
                npad = Tcap_c - tiles.shape[0]
                tiles = np.concatenate(
                    [tiles, np.zeros((npad, tiles.shape[1]), np.uint8)])
                tidx = np.concatenate(  # trash row of the scatter grid
                    [tidx, np.full((npad,),
                                   B * (Hp // TILE) * (Wp // TILE), np.int32)])
            out = run((jnp.asarray(tiles), jnp.asarray(tidx)),
                      tuple(jnp.asarray(m) for m in metas_c),
                      jnp.asarray(nch_used), jnp.asarray(Ks),
                      jnp.asarray(dists), table)
            return ("roi", (batch_files, batch_cams, nb, out))

        def _dispatch_tiles_sharded(batch_files, batch_cams, nb, gray,
                                    quads, valid, areas, Q_all, HW, Ks, dists):
            """Mesh fast path: one tile batch PER DEVICE SHARD, run under
            ``shard_map`` over the mesh's batch axis.  Every stage of the
            tile program is per-image independent (scatter into the local
            frame grid, crop-view refine/decode, per-image dedup/PnP), so
            the per-shard programs need no collectives — this is the
            reference's per-core ``mp.Pool`` scaling (cam.py:243-255) as
            data parallelism over devices, with the SAME tile-union
            transport as the single-device roi mode (detection-identical;
            the old full-frame gather program is no longer the mesh route).
            Shards share one compiled program: per-tier caps and the tile
            payload cap take the max over shards (+dominance reuse), and
            each shard's dynamic-trip chunk loops skip its padding.

            Returns None when any shard has an over-tier site (caller falls
            back to the sharded full-frame program).
            """
            from .ops.roi import TILE

            H, W = HW
            Bs = B // n_shards
            tbs = []
            for d in range(n_shards):
                sl = slice(d * Bs, (d + 1) * Bs)
                tb = build_tile_batch(gray[sl], quads[sl], valid[sl],
                                      areas[sl], H, W, params)
                if tb is None:
                    return None
                tbs.append(tb)
            if not any(tb.caps for tb in tbs):  # blank frames everywhere
                empty = np.zeros((23, B * params.max_detections), np.float32)
                return ("roi", (batch_files, batch_cams, nb, empty))
            merged: dict = {}
            for tb in tbs:
                for T, N in tb.caps:
                    merged[T] = max(merged.get(T, 0), N)
            caps_tight = tuple(sorted(merged.items()))
            Tcap_tight = max(tb.tiles.shape[0] for tb in tbs)
            Hp, Wp = tbs[0].frame_hw

            def build(caps_c, Tcap_c):
                import jax
                from jax.sharding import PartitionSpec as P

                inner = _build_roi_detect(
                    Bs, Q_all, (H, W), caps_c, n_bits, params, lm_iters,
                    float(marker_size), pnp_method, use_mm,
                    tile_spec=(Hp, Wp, TILE, Tcap_c))
                axis = mesh.axis_names[0]
                ntiers = len(caps_c)

                def local(tiles, tidx, nch_used, Ks_s, dists_s, table_r, *metas):
                    return inner((tiles[0], tidx[0]),
                                 tuple(m[0] for m in metas), nch_used[0],
                                 Ks_s, dists_s, table_r)

                sm = jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                              P(), *([P(axis)] * ntiers)),
                    out_specs=P(None, axis),
                    check_vma=False,
                )
                return jax.jit(sm)

            run, caps_c, Tcap_c = _get_dominating_pipeline(
                "roitile_mesh",
                (mesh, Bs, Q_all, (H, W), (Hp, Wp, TILE), n_bits, params,
                 lm_iters, float(marker_size), pnp_method, use_mm,
                 _roi_chunk_target()),
                caps_tight, max(Tcap_tight, 1), build,
            )
            ntiers = len(caps_c)
            metas_all = [[] for _ in range(ntiers)]
            nch_all, tiles_all, tidx_all = [], [], []
            trash_row = Bs * (Hp // TILE) * (Wp // TILE)
            for tb in tbs:
                metas_c, nch_used = _pad_tier_metas(tb.caps, tb.metas,
                                                    caps_c, Bs * Q_all)
                for ti, m in enumerate(metas_c):
                    metas_all[ti].append(m)
                nch_all.append(nch_used)
                tiles, tidx = tb.tiles, tb.tidx
                if Tcap_c > tiles.shape[0]:
                    npad = Tcap_c - tiles.shape[0]
                    tiles = np.concatenate(
                        [tiles, np.zeros((npad, tiles.shape[1]), np.uint8)])
                    tidx = np.concatenate(
                        [tidx, np.full((npad,), trash_row, np.int32)])
                tiles_all.append(tiles)
                tidx_all.append(tidx)
            out = run(jnp.asarray(np.stack(tiles_all)),
                      jnp.asarray(np.stack(tidx_all)),
                      jnp.asarray(np.stack(nch_all)),
                      jnp.asarray(Ks), jnp.asarray(dists), table,
                      *(jnp.asarray(np.stack(ms)) for ms in metas_all))
            return ("roi", (batch_files, batch_cams, nb, out))

        def stage_threshold(prep):
            """Feed side: host threshold + C CCL + ROI assembly + upload +
            detection dispatch (async).  Only the candidate-region tiles
            (or crop windows) cross the host link."""
            batch_files, batch_cams, nb, gray, Ks, dists, (H, W) = prep
            quads, valid, areas = host_candidates(gray, params)
            Q_all = quads.shape[1]  # slot layout incl. any 4-conn splits
            rb = None
            if upload == "tiles":
                if n_shards > 1:
                    res = _dispatch_tiles_sharded(
                        batch_files, batch_cams, nb, gray, quads, valid,
                        areas, Q_all, (H, W), Ks, dists)
                    if res is not None:
                        return res
                else:
                    rb = build_tile_batch(gray, quads, valid, areas, H, W,
                                          params)
                    if rb is not None:
                        return _dispatch_tiles(batch_files, batch_cams, nb,
                                               rb, Q_all, (H, W), Ks, dists)
            else:
                rb = build_roi_batch(gray, quads, valid, areas, H, W, params)
            if rb is None:
                # a site exceeds the top tier (very close-range marker):
                # exact full-frame fallback via the hybrid program, with
                # the usual bucket padding
                Hb, Wb = _bucket_hw(H, W)
                if (Hb, Wb) != (H, W):
                    gray = np.pad(gray, ((0, 0), (0, Hb - H), (0, Wb - W)),
                                  mode="edge")
                (gray_dev,) = shard([gray])
                return ("full", (batch_files, batch_cams, nb), gray_dev,
                        quads, valid, areas, Ks, dists)
            if not rb.caps:
                # no candidates anywhere in the batch (blank frames):
                # nothing to dispatch — synthesize an all-invalid result
                empty = np.zeros((23, B * params.max_detections), np.float32)
                return ("roi", (batch_files, batch_cams, nb, empty))
            run = _get_pipeline(
                ("roi", B, Q_all, (H, W), rb.caps, n_bits, params, lm_iters,
                 float(marker_size), pnp_method, use_mm, _roi_chunk_target()),
                lambda: _build_roi_detect(B, Q_all, (H, W), rb.caps, n_bits,
                                          params, lm_iters, float(marker_size),
                                          pnp_method, use_mm),
            )
            crops_dev = tuple(jnp.asarray(c) for c in rb.crops)
            meta_dev = tuple(jnp.asarray(m) for m in rb.meta)
            nch_used = np.asarray(  # exact caps: every chunk is occupied
                [-(-N // _tier_chunk(T, N)) for T, _R, N in rb.caps], np.int32)
            out = run(crops_dev, meta_dev, jnp.asarray(nch_used),
                      jnp.asarray(Ks), jnp.asarray(dists), table)
            return ("roi", (batch_files, batch_cams, nb, out))

        def stage_ccl(handle):
            if handle[0] == "roi":
                return handle[1]
            _, meta, gray_dev, quads, valid, areas, Ks, dists = handle
            return dispatch_detect(meta, gray_dev, quads, valid, areas, Ks, dists)

    elif mode == "host":

        def stage_threshold(prep):
            batch_files, batch_cams, nb, gray, Ks, dists, (H, W) = prep
            # candidates from the EXACT image (host threshold); the padded
            # gray ships for the (bucket-keyed) detect program
            quads, valid, areas = host_candidates(
                np.ascontiguousarray(gray[:, :H, :W]), params)
            (gray_dev,) = shard([gray])
            return ((batch_files, batch_cams, nb), gray_dev, quads, valid,
                    areas, Ks, dists, (H, W))

        def stage_ccl(handle):
            meta, gray_dev, quads, valid, areas, Ks, dists, hw = handle
            return dispatch_detect(meta, gray_dev, quads, valid, areas, Ks,
                                   dists, hw=hw)

    else:  # "pure"

        def stage_threshold(prep):
            batch_files, batch_cams, nb, gray, Ks, dists, _hw = prep
            run = _get_pipeline(
                ("pure", gray.shape[1], gray.shape[2], B, n_bits, params, lm_iters,
                 float(marker_size), pnp_method),
                lambda: _build_pure_device(B, n_bits, params, lm_iters,
                                           float(marker_size), pnp_method),
            )
            gray_dev, Ks_d, dists_d = shard([gray, Ks, dists])
            return (batch_files, batch_cams, nb, run(gray_dev, Ks_d, dists_d, table))

        def stage_ccl(handle):
            return handle  # the single program did everything

    def consume(handle, batch_index):
        """Fetch + unpack one batch's results into the edge dict."""
        nonlocal total_det
        batch_files, batch_cams, nb, result = handle
        Dcap = params.max_detections
        corners, ids, ok, R, t, err = _unpack_pnp_result(result)
        R = R.astype(np.float64)
        t = t.astype(np.float64)
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

    # Two-thread software pipeline: a worker thread runs the FEED side
    # (JPEG decode, preprocess, H2D upload, threshold dispatch — cv2 and
    # the PJRT transfer release the GIL) while the main thread runs the
    # DRAIN side (tile fetch, C quad extraction, detection dispatch, result
    # unpack).  On a slow host link the upload and the fetches otherwise
    # serialize with the host work on one thread — measured ~2x throughput
    # from the overlap.  Two batches are in flight on each side; batch
    # order (and the output dict order) stays deterministic.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    starts = list(range(0, len(im_filenames), B))
    # 0/unset -> default 2; clamped to >= 1 (0 or negative depths would
    # crash or misorder the pipeline loop below)
    DEPTH = max(1, int(os.environ.get("VICAN_TPU_PIPELINE_DEPTH") or 2) or 2)
    pending_d = None  # detection dispatched, fetch pending
    with ThreadPoolExecutor(max_workers=1) as ex:
        futs = deque(
            ex.submit(lambda s=s: stage_threshold(prepare(s)))
            for s in starts[:DEPTH]
        )
        for bi in range(len(starts)):
            handle_t = futs.popleft().result()
            if bi + DEPTH < len(starts):
                s = starts[bi + DEPTH]
                futs.append(ex.submit(lambda s=s: stage_threshold(prepare(s))))
            handle_d = stage_ccl(handle_t)
            if pending_d is not None:
                consume(*pending_d)
            pending_d = (handle_d, bi)
    if pending_d is not None:
        consume(*pending_d)
    if verbose:
        n_images = len({v["im_filename"] for v in out.values()})
        print(f"Found markers in {n_images} images ({total_det} detections).")
    return out

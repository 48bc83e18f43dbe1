"""ArUco marker detection as fixed-shape device code.

Replaces OpenCV's ``cv.aruco.detectMarkers`` C++ pipeline (reference
vican/cam.py:147 with the tuned parameters at cam.py:126-135) with a
jit/vmap-able implementation under XLA's static-shape constraints
(fixed-capacity candidate slots + validity masks everywhere):

1. :func:`preprocess`          — the reference's int16 contrast/brightness
                                 transform (cam.py:137-145) + BGR grayscale.
2. :func:`adaptive_threshold`  — mean-C threshold via integral images, swept
                                 over the detector's window sizes
                                 (adaptiveThreshWinSize* — cam.py:132-135).
3. :func:`connected_components`— 8-connected label propagation (pure-jnp
                                 fallback; the production path uses the C
                                 union-find kernel in _native/fastccl.c —
                                 labeling is irregular pointer-chasing where
                                 a CPU beats any dense-tensor formulation).
4. :func:`extract_quads`       — top-K components by (downsampled) area;
                                 corners from farthest-point geometry, fixed
                                 capacity with validity masks.
5. :func:`refine_corners`      — gradient-weighted edge line fits + line
                                 intersection (AprilTag-style subpixel,
                                 CORNER_REFINE_APRILTAG — cam.py:130).
6. :func:`decode_quads`        — homography bit sampling + rotation-aware
                                 dictionary matching (DICT_4X4_1000 et al from
                                 :mod:`vican_tpu.ops.dictionary`).
7. :func:`detect_markers`      — full per-image pipeline over all window
                                 sizes, with cross-window deduplication.

Returned corners follow OpenCV's convention: top-left first, clockwise in
image coordinates, at the outer black-border pixel centers.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "DetectorParams",
    "dedup_and_compact",
    "preprocess",
    "adaptive_threshold",
    "connected_components",
    "extract_quads",
    "refit_degenerate_quads",
    "refine_corners",
    "refine_corners_subpix",
    "refine_quad",
    "decode_one",
    "decode_quads",
    "MatmulImage",
    "CropView",
    "MatmulCropView",
    "detect_markers",
    "resolve_error_correction",
    "resolve_pallas",
    "resolve_roi_matmul",
]

BIG = jnp.int32(2**30)


def resolve_error_correction(params: "DetectorParams", aruco: str) -> "DetectorParams":
    """Fill in the auto Hamming budget from the dictionary's min distance.

    ``error_correction_bits=None`` becomes ``floor(rate * (tau-1)//2)`` —
    correction capped at the unique-decoding radius times OpenCV's
    ``errorCorrectionRate`` convention, so a corrected word can never be
    closer to a different (rotation of a) dictionary word: the 0-false-id
    property is preserved by construction.  For DICT_4X4_1000 (tau = 2) the
    budget is 0, i.e. strict matching — correction is information-
    theoretically unsafe there, exactly as in OpenCV.
    """
    if params.error_correction_bits is not None:
        return params
    from .dictionary import max_correction_bits

    budget = int(params.error_correction_rate * max_correction_bits(aruco))
    return params._replace(error_correction_bits=budget)


def resolve_pallas(params: "DetectorParams") -> bool:
    """Whether the fused Pallas threshold kernel should run.

    ``use_pallas_threshold=None`` means auto: on (real compilation) for TPU
    backends, off elsewhere (the XLA integral-image formulation is the
    portable path; the kernel's Mosaic lowering is TPU-only).
    """
    if params.use_pallas_threshold is None:
        return jax.default_backend() == "tpu"
    return bool(params.use_pallas_threshold)


def resolve_roi_matmul(params: "DetectorParams") -> bool:
    """Whether ROI-crop sampling routes through :class:`MatmulImage`.

    Auto (None): on for TPU backends (gathers serialize there), off
    elsewhere (CPU/GPU gathers are fine and cheaper than one-hots).  The
    two samplers are bit-identical, so this is purely a speed knob.
    """
    if params.roi_matmul_sampling is None:
        return jax.default_backend() == "tpu"
    return bool(params.roi_matmul_sampling)


class DetectorParams(NamedTuple):
    """Static detector configuration (mirrors cv.aruco.DetectorParameters).

    Defaults follow the reference's tuned values (cam.py:131-135):
    window sizes 3..35 step 5 (odd-ified like OpenCV), constant 10.
    """

    win_sizes: tuple = (3, 9, 13, 19, 23, 29, 33)
    thresh_const: float = 10.0
    max_candidates: int = 16  # per window size
    # extra per-window slots for 4-connected SPLIT candidates: at extreme
    # oblique angles adjacent markers merge into one 8-connected component
    # via diagonal aliasing strands; 4-connectivity breaks those strands
    # and the strict dictionary decode gates the extras (0 disables)
    max_candidates_4conn: int = 8
    max_detections: int = 24  # per image, after dedup
    ccl_passes: int = 10
    min_area: float = 64.0  # px^2, component area
    max_area_rate: float = 0.25  # fraction of image area
    border_margin: int = 2  # px, candidates touching the border are dropped
    refine_samples: int = 16  # samples per edge for subpixel refinement
    refine_offsets: int = 5  # perpendicular probes per sample
    corner_refine: str = "apriltag"
    max_border_err_rate: float = 0.35  # erroneous border bits tolerated
    # Hamming budget for id matching. None = auto: floor(error_correction_rate
    # * max_correction_bits(dictionary)) — resolve_error_correction() fills it
    # in from the dictionary's minimum distance before the detector runs.
    error_correction_bits: int | None = None
    error_correction_rate: float = 0.6  # cv2 errorCorrectionRate default
    decode_samples: int = 5  # NxN samples per bit cell
    use_pallas_threshold: bool | None = None  # fused one-pass TPU kernel; None = auto (TPU yes)
    # Device-mode mask compaction: per-(image, window) capacity for shipped
    # 16x16 mask tiles, as a fraction of the tile grid.  Marker scenes run
    # ~12% occupancy; overflowing frames fall back to full masks (exact).
    mask_tile_rate: float = 0.25
    # ROI-crop transport (perception "roi" mode): crop window size tiers,
    # margin beyond each candidate bbox (must cover the refine/decode
    # sampling excursion — see ops/roi.py), and whether sampling uses the
    # one-hot matmul path (None = auto: TPU yes; both paths are bit-exact).
    # The 512 tier exists for rare elongated sites (degenerate aliasing
    # slivers, very close-range markers): ONE candidate that fits no tier
    # sends its whole batch to the full-frame fallback — a ~5x transport
    # blow-up per batch on a remote-tunnel host (measured: one 142x399 px
    # sliver cost the bench scene ~0.6 s/batch).  An unused tier costs
    # nothing at runtime (its dynamic-trip chunk loop runs 0 iterations).
    roi_tiers: tuple = (64, 128, 192, 256, 320, 384, 512)
    roi_margin: int = 8
    roi_matmul_sampling: bool | None = None
    # Device-side mirror of the host hull re-fit for degenerate-extraction
    # candidates (perception._refit_degenerate_quad): fixed re-fit slots per
    # image and the per-row-extreme subsampling cap for the hull point set
    # (exact when the component bbox is at most refit_rows tall).  Only the
    # pure-device pipeline pays for this; hybrid modes re-fit on host.
    max_refit_candidates: int = 6
    refit_rows: int = 128
    subpix_win: int = 5  # cornerSubPix half-window (cv2 winSize=(5,5))
    subpix_iters: int = 50  # cornerRefinementMaxIterations (cam.py:133)
    subpix_acc: float = 0.05  # cornerRefinementMinAccuracy (cam.py:131)
    min_cell_contrast: float = 20.0  # grey levels between darkest/brightest cell means
    refine_clamp_px: float = 4.0  # reject refinements moving a corner farther
    dedup_radius_rate: float = 0.5  # x min quad edge length: duplicate-center radius


def preprocess(im, brightness: float = 0.0, contrast: float = 0.0):
    """Reference image preprocessing + grayscale (cam.py:137-145).

    ``im``: uint8 (..., H, W, 3) BGR or (..., H, W) gray.  The reference does
    ``int16(im) * (contrast/127 + 1) - contrast + brightness`` then clips to
    [0, 255] and truncates to uint8; detectMarkers then converts BGR->gray.
    Returns float32 grayscale in [0, 255].
    """
    x = im.astype(jnp.float32)
    if contrast != 0:
        x = x * (contrast / 127.0 + 1.0) - contrast
    x = x + brightness
    x = jnp.clip(x, 0.0, 255.0)
    x = jnp.floor(x)  # uint8 truncation parity (values are non-negative)
    if x.shape[-1] == 3 and x.ndim >= 3:
        # OpenCV BGR2GRAY weights, with round-half-away like cvtColor
        x = jnp.floor(0.114 * x[..., 0] + 0.587 * x[..., 1] + 0.299 * x[..., 2] + 0.5)
    return x


def _box_mean(im, win: int):
    """Mean filter with replicate borders via integral images.

    ``win`` odd; matches cv.adaptiveThreshold's BORDER_REPLICATE boxFilter.
    The integral image accumulates in int32: pixel values are integers
    (uint8-derived), and a 720p f32 cumsum reaches ~2.4e8 where rounding is
    ~±14 grey levels — larger than the threshold constant itself.  Integer
    accumulation makes the box sums exact (and consistent with the Pallas
    kernel, whose incremental sums stay below 2^24).
    """
    r = win // 2
    H, W = im.shape[-2:]
    padded = jnp.pad(im, [(0, 0)] * (im.ndim - 2) + [(r, r), (r, r)], mode="edge")
    acc = padded.astype(jnp.int32)
    ii = jnp.cumsum(jnp.cumsum(acc, axis=-2), axis=-1)
    ii = jnp.pad(ii, [(0, 0)] * (im.ndim - 2) + [(1, 0), (1, 0)])
    s = (
        ii[..., win:, win:]
        - ii[..., :-win, win:]
        - ii[..., win:, :-win]
        + ii[..., :-win, :-win]
    )
    return s.astype(im.dtype) / (win * win)


def adaptive_threshold(gray, win: int, C: float):
    """ADAPTIVE_THRESH_MEAN_C + THRESH_BINARY_INV: foreground = dark pixels.

    ``dst = src <= mean - C`` (markers' black border becomes foreground).
    """
    return gray <= _box_mean(gray, win) - C


def _neighbor_min(labels, fg, diagonal: bool = True):
    """Min of the 8- (or 4-) neighborhood labels (masked to foreground).

    8-connectivity matters: thin oblique marker borders are only diagonally
    connected (OpenCV's contour following is 8-connected too).  The 4-conn
    variant feeds the SPLIT candidate pass (see :func:`extract_split_quads`).
    """
    row = labels
    row = jnp.minimum(row, jnp.pad(labels, ((0, 0), (1, 0)), constant_values=BIG)[:, :-1])
    row = jnp.minimum(row, jnp.pad(labels, ((0, 0), (0, 1)), constant_values=BIG)[:, 1:])
    # vertical (+ diagonal when the row-wise min is shifted) neighbors
    vert = row if diagonal else labels
    out = jnp.minimum(row, jnp.pad(vert, ((1, 0), (0, 0)), constant_values=BIG)[:-1, :])
    out = jnp.minimum(out, jnp.pad(vert, ((0, 1), (0, 0)), constant_values=BIG)[1:, :])
    return jnp.where(fg, out, BIG)


def _run_min_scan(labels, fg, axis: int):
    """Min-propagate labels along contiguous foreground runs of one axis.

    Segmented min-scan (forward + backward associative scans with segment
    restarts at background pixels): the minimum label of a run reaches
    EVERY pixel of that run in one pass, regardless of run length.
    """
    start = ~fg
    axis = axis % labels.ndim  # lax.rev rejects negative axes under reverse=True

    def op(a, b):
        m1, s1 = a
        m2, s2 = b
        return jnp.where(s2, m2, jnp.minimum(m1, m2)), s1 | s2

    m_f, _ = lax.associative_scan(op, (labels, start), axis=axis)
    m_b, _ = lax.associative_scan(op, (labels, start), axis=axis, reverse=True)
    return jnp.where(fg, jnp.minimum(m_f, m_b), BIG)


def connected_components(fg, passes: int = 10, diagonal: bool = True):
    """8-connected component labels: run scans + label propagation + pointer
    jumping.

    Per pass: an 8-neighborhood minimum (links diagonal/corner pixels), a
    segmented min-scan along rows and columns (propagates across an entire
    straight run in one step — without it, min labels crawl one pixel per
    pass and large components like close-range marker rings need
    O(perimeter) passes: the r2 pure-vs-device detection deficit traced to
    exactly this underconvergence, 130 vs 22 components at 10 passes on a
    close-range frame), then two pointer-jumping steps
    (``label <- label[label]``) that flatten label trees exponentially.
    Everything is shifts, scans and gathers — jit/vmap-friendly and
    TPU-compatible.

    Labels are the minimum linear pixel index of the component; background is
    ``BIG``.
    """
    H, W = fg.shape[-2:]
    lin = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    labels = jnp.where(fg, lin, BIG)

    def jump(labels):
        flat = labels.reshape(-1)
        idx = jnp.clip(flat, 0, H * W - 1)
        return jnp.where(fg, jnp.minimum(labels, flat[idx].reshape(H, W)), BIG)

    def body(_, labels):
        labels = _neighbor_min(labels, fg, diagonal)
        labels = _run_min_scan(labels, fg, -1)
        labels = _run_min_scan(labels, fg, -2)
        labels = jump(labels)
        labels = jump(labels)
        return labels

    return lax.fori_loop(0, passes, body, labels)


def _top_k_labels(labels, K: int, H: int, W: int, max_area=None, min_area=None):
    """K most frequent labels by area, estimated on a 2x-downsampled grid.

    One small scatter-add; exact areas are recomputed per candidate later.
    Components whose (estimated) area falls outside [min_area, max_area]
    are excluded from the ranking BEFORE top-k — the C extractor gates
    during extraction (fastccl.c), and without this, oversized junk
    components (image-scale threshold blobs) crowd real markers out of the
    K slots in close-range frames (the r2 pure-vs-device 371-vs-380
    detection deficit: whole frames lost 4-10 markers each).  Margins of
    2x absorb the downsample estimation error; the exact gates in
    :func:`extract_quads` still apply afterwards.
    """
    ds = labels[..., ::2, ::2]
    flat = jnp.where(ds == BIG, H * W, ds).reshape(-1)
    areas = jnp.zeros((H * W + 1,), jnp.int32).at[flat].add(1)
    areas = areas.at[H * W].set(0)  # background sentinel never wins
    areas = areas * 4  # full-resolution estimate
    if max_area is not None:
        areas = jnp.where(areas > 2.0 * max_area, 0, areas)
    if min_area is not None:
        areas = jnp.where(areas < 0.25 * min_area, 0, areas)
    top_areas, top_labels = lax.top_k(areas, K)
    return top_labels.astype(jnp.int32), top_areas


class QuadCandidates(NamedTuple):
    corners: jnp.ndarray  # (K, 4, 2) float32 (x, y)
    valid: jnp.ndarray  # (K,) bool
    area: jnp.ndarray  # (K,) float32 quad area (dedup score)
    # extra per-slot info consumed by the device-side degenerate re-fit
    # (:func:`refit_degenerate_quads`); None when not requested
    label: jnp.ndarray | None = None  # (K,) int32 component label
    area_px: jnp.ndarray | None = None  # (K,) float32 component pixel area
    refit: jnp.ndarray | None = None  # (K,) bool gate-rejected degenerate


def extract_quads(labels, params: DetectorParams, top_labels=None,
                  parent_labels=None, k_slots=None) -> QuadCandidates:
    """Corner extraction for the top-K components of one label image.

    Farthest-point geometry: p1 = farthest from centroid, p2 = farthest from
    p1 (the diagonal), p3/p4 = extremes of the signed distance to line
    (p1, p2).  Ordered clockwise (image coords) starting from p1.

    ``top_labels``/``parent_labels``/``k_slots`` serve the 4-connected
    SPLIT pass (:func:`extract_split_quads`): explicit candidate labels,
    and an 8-connected label image whose component must be STRICTLY larger
    than the candidate (area4 < area8) for the slot to be valid.
    """
    H, W = labels.shape
    K = k_slots if k_slots is not None else params.max_candidates
    if top_labels is None:
        top_labels, _ = _top_k_labels(
            labels, K, H, W,
            max_area=params.max_area_rate * H * W, min_area=params.min_area,
        )

    ys, xs = jnp.mgrid[0:H, 0:W]
    xs = xs.astype(jnp.float32).reshape(-1)
    ys = ys.astype(jnp.float32).reshape(-1)
    flat_labels = labels.reshape(-1)

    def one(label):
        mask = flat_labels == label
        area = jnp.sum(mask)
        areaf = jnp.maximum(area.astype(jnp.float32), 1.0)
        cx = jnp.sum(jnp.where(mask, xs, 0.0)) / areaf
        cy = jnp.sum(jnp.where(mask, ys, 0.0)) / areaf

        def farthest(px, py):
            d2 = (xs - px) ** 2 + (ys - py) ** 2
            i = jnp.argmax(jnp.where(mask, d2, -1.0))
            return xs[i], ys[i]

        p1x, p1y = farthest(cx, cy)
        p2x, p2y = farthest(p1x, p1y)
        # signed distance to the diagonal line p1 -> p2
        dx, dy = p2x - p1x, p2y - p1y
        cross = (xs - p1x) * dy - (ys - p1y) * dx
        i3 = jnp.argmax(jnp.where(mask, cross, -jnp.inf))
        i4 = jnp.argmax(jnp.where(mask, -cross, -jnp.inf))
        p3 = jnp.array([xs[i3], ys[i3]])
        p4 = jnp.array([xs[i4], ys[i4]])
        p1 = jnp.array([p1x, p1y])
        p2 = jnp.array([p2x, p2y])
        quad = jnp.stack([p1, p3, p2, p4])  # cyclic order around the quad

        # clockwise winding in image coordinates (positive shoelace with
        # y-down axes)
        x = quad[:, 0]
        y = quad[:, 1]
        shoelace = jnp.sum(x * jnp.roll(y, -1) - jnp.roll(x, -1) * y)
        quad = jnp.where(shoelace < 0, quad[jnp.array([0, 3, 2, 1])], quad)

        # validity gates
        edges = jnp.roll(quad, -1, axis=0) - quad
        edge_len = jnp.linalg.norm(edges, axis=1)
        quad_area = 0.5 * jnp.abs(shoelace)
        m = params.border_margin
        inside = (
            (quad[:, 0] >= m) & (quad[:, 0] <= W - 1 - m)
            & (quad[:, 1] >= m) & (quad[:, 1] <= H - 1 - m)
        ).all()
        # convexity: all cross products of consecutive edges share a sign
        e_next = jnp.roll(edges, -1, axis=0)
        crosses = edges[:, 0] * e_next[:, 1] - edges[:, 1] * e_next[:, 0]
        convex = (crosses > 0).all() | (crosses < 0).all()
        # the component must fill a reasonable fraction of its quad (border
        # rings fill ~50-60%) OR be a ring/outline at least ~1 px thick
        # along the quad perimeter — large markers hollow under the
        # adaptive threshold into thin square annuli whose fill ratio drops
        # with size; the outline alternative only opens at quad sizes where
        # hollowing can occur (see perception._quad_gates)
        fill = area.astype(jnp.float32) / jnp.maximum(quad_area, 1.0)
        min_hollow_side = 4.0 * max(params.win_sizes)
        outline = (
            area.astype(jnp.float32) >= jnp.maximum(edge_len.sum(), 1.0)
        ) & (quad_area >= min_hollow_side * min_hollow_side)
        emitted = (
            (label != BIG)
            & (area >= params.min_area)
            & (area <= params.max_area_rate * H * W)
        )
        if parent_labels is not None:
            # split gate (exact): the 4-conn component must be a strict
            # subset of its 8-conn parent — the parent label is the 8-label
            # at the candidate's root pixel (labels are min pixel indices)
            par = parent_labels.reshape(-1)[jnp.clip(label, 0, H * W - 1)]
            area8 = jnp.sum(parent_labels.reshape(-1) == par)
            emitted = emitted & (area < area8)
        valid = (
            emitted
            & (edge_len.min() >= 5.0)
            & inside
            & convex
            & ((fill > 0.2) | outline)
        )
        # degeneracy signature (same trigger as the host re-fit in
        # perception._collect_window_candidates): a collapsed corner pair
        # or a non-convex corner order on an otherwise-emitted candidate
        refit = emitted & ~valid & ((edge_len.min() < 5.0) | ~convex)
        return quad, valid, quad_area, area.astype(jnp.float32), refit

    corners, valid, area, area_px, refit = jax.vmap(one)(top_labels)
    return QuadCandidates(corners=corners, valid=valid, area=area,
                          label=top_labels, area_px=area_px, refit=refit)


def extract_split_quads(labels8, labels4, params: DetectorParams) -> QuadCandidates:
    """4-connected SPLIT candidates (see fastccl.c module docstring).

    Ranks 4-connected components that are (by the downsampled estimate)
    strictly smaller than their 8-connected parent — i.e. a diagonal
    aliasing strand broke — and extracts their quads with the exact
    ``area4 < area8`` gate.  Mirrors the C extractor's packed2 pass so the
    pure-device mode keeps candidate parity.
    """
    H, W = labels4.shape
    K2 = params.max_candidates_4conn
    ds4 = labels4[::2, ::2]
    ds8 = labels8[::2, ::2]
    flat4 = jnp.where(ds4 == BIG, H * W, ds4).reshape(-1)
    flat8 = jnp.where(ds8 == BIG, H * W, ds8).reshape(-1)
    est4 = jnp.zeros((H * W + 1,), jnp.int32).at[flat4].add(1).at[H * W].set(0) * 4
    est8 = jnp.zeros((H * W + 1,), jnp.int32).at[flat8].add(1).at[H * W].set(0) * 4
    # parent 8-label of each candidate 4-label (labels are min pixel indices)
    par = labels8.reshape(-1)
    par_est = est8[jnp.where(par == BIG, H * W, par)]
    ranked = jnp.where(
        (est4[: H * W] > 0)
        & (est4[: H * W] < par_est)
        & (est4[: H * W] >= 0.25 * params.min_area)
        & (est4[: H * W] <= 2.0 * params.max_area_rate * H * W),
        est4[: H * W], 0,
    )
    _, top4 = lax.top_k(ranked, K2)
    return extract_quads(labels4, params, top_labels=top4.astype(jnp.int32),
                         parent_labels=labels8, k_slots=K2)


def refit_degenerate_quads(cand, labels8, labels4, params: DetectorParams):
    """Device mirror of the host hull re-fit (perception._refit_degenerate_quad).

    At extreme oblique view angles a marker's long SIDE exceeds its
    diagonal, so farthest-point extraction collapses two corners and the
    shape gates reject the candidate.  The recovery — shared semantics with
    the host path — is the MAXIMUM-AREA QUADRILATERAL over the component's
    per-row x-extremes (a superset of its convex hull vertices: any hull
    vertex not extreme in its row would be a convex combination of its row
    neighbours).  Fixed shapes throughout: the ``params.max_refit_candidates``
    largest gate-rejected-degenerate candidates are selected with ``top_k``
    and re-fit by an ``O(m^2)``-per-diagonal scan over ``m = 2*refit_rows``
    subsampled row-extreme points (exact when the component bbox is at most
    ``refit_rows`` tall; taller components re-fit on a row subsample, which
    the downstream gradient refinement absorbs).  The decode stage remains
    the backstop, so a bad re-fit can never produce a false id.

    ``cand``: merged per-window candidates with ``label``/``area_px``/
    ``refit`` info (shape ``(Wn, Ks)`` slots, split slots at index >= K).
    """
    Wn, Ks = cand.valid.shape
    H, W = labels8.shape[-2:]
    K = params.max_candidates
    R = params.max_refit_candidates
    M = params.refit_rows
    m = 2 * M

    score = jnp.where(cand.refit.reshape(-1), cand.area_px.reshape(-1), -1.0)
    _, sel = lax.top_k(score, R)
    sel_ok = score[sel] > 0.0
    lab_imgs = jnp.stack([labels8, labels4])  # (2, Wn, H, W)
    xs_w = jnp.arange(W, dtype=jnp.int32)
    ys_h = jnp.arange(H, dtype=jnp.int32)
    flat_labels = cand.label.reshape(-1)
    flat_area_px = cand.area_px.reshape(-1)
    pidx = jnp.arange(m)

    def one(slot, ok):
        wi = slot // Ks
        conn4 = ((slot % Ks) >= K).astype(jnp.int32)
        limg = lab_imgs[conn4, wi]  # (H, W)
        mask = limg == flat_labels[slot]
        # per-row x-extremes of the component + its bbox rows
        xmin = jnp.where(mask, xs_w[None, :], W).min(1)
        xmax = jnp.where(mask, xs_w[None, :], -1).max(1)
        rowv = mask.any(1)
        y0 = jnp.where(rowv, ys_h, H).min()
        y1 = jnp.where(rowv, ys_h, -1).max()
        h = jnp.maximum(y1 - y0, 0)
        ri = jnp.clip(y0 + (jnp.arange(M) * h) // max(M - 1, 1), 0, H - 1)
        px = jnp.concatenate([xmin[ri], xmax[ri]]).astype(jnp.float32)
        py = jnp.concatenate([ri, ri]).astype(jnp.float32)
        pv = jnp.concatenate([rowv[ri], rowv[ri]]) & ok

        def step(best, i):
            # max-area completion for every diagonal/edge (i, j): the
            # farthest point on each side of the i->j line (host
            # _max_area_quad does the same over hull vertices)
            dxk = px - px[i]
            dyk = py - py[i]
            cr = dxk[:, None] * dyk[None, :] - dyk[:, None] * dxk[None, :]
            crm_up = jnp.where(pv[:, None], cr, -jnp.inf)
            crm_dn = jnp.where(pv[:, None], cr, jnp.inf)
            up_i = crm_up.argmax(0)
            dn_i = crm_dn.argmin(0)
            jmask = pv & (pidx != i) & pv[i]
            areas = jnp.where(
                jmask,
                jnp.abs(crm_up.max(0)) + jnp.abs(crm_dn.min(0)),
                -1.0,
            )
            j = jnp.argmax(areas)
            quad = jnp.stack([
                jnp.stack([px[i], py[i]]),
                jnp.stack([px[up_i[j]], py[up_i[j]]]),
                jnp.stack([px[j], py[j]]),
                jnp.stack([px[dn_i[j]], py[dn_i[j]]]),
            ])
            best_area, best_quad = best
            better = areas[j] > best_area
            return (jnp.where(better, areas[j], best_area),
                    jnp.where(better, quad, best_quad)), None

        (_, quad), _ = lax.scan(
            step, (jnp.float32(-1.0), jnp.zeros((4, 2), jnp.float32)), pidx
        )

        # clockwise winding + the same validity gates as extract_quads
        x = quad[:, 0]
        y = quad[:, 1]
        shoelace = jnp.sum(x * jnp.roll(y, -1) - jnp.roll(x, -1) * y)
        quad = jnp.where(shoelace < 0, quad[jnp.array([0, 3, 2, 1])], quad)
        edges = jnp.roll(quad, -1, axis=0) - quad
        edge_len = jnp.linalg.norm(edges, axis=1)
        quad_area = 0.5 * jnp.abs(shoelace)
        mg = params.border_margin
        inside = (
            (quad[:, 0] >= mg) & (quad[:, 0] <= W - 1 - mg)
            & (quad[:, 1] >= mg) & (quad[:, 1] <= H - 1 - mg)
        ).all()
        e_next = jnp.roll(edges, -1, axis=0)
        crosses = edges[:, 0] * e_next[:, 1] - edges[:, 1] * e_next[:, 0]
        convex = (crosses > 0).all() | (crosses < 0).all()
        area_px = flat_area_px[slot]
        fill = area_px / jnp.maximum(quad_area, 1.0)
        min_hollow_side = 4.0 * max(params.win_sizes)
        outline = (
            area_px >= jnp.maximum(edge_len.sum(), 1.0)
        ) & (quad_area >= min_hollow_side * min_hollow_side)
        valid_new = (
            ok
            & (edge_len.min() >= 5.0)
            & inside
            & convex
            & ((fill > 0.2) | outline)
        )
        return quad, valid_new, quad_area

    quads_new, valid_new, qarea_new = jax.vmap(one)(sel, sel_ok)
    corners = cand.corners.reshape(-1, 4, 2)
    valid = cand.valid.reshape(-1)
    area = cand.area.reshape(-1)
    corners = corners.at[sel].set(
        jnp.where(valid_new[:, None, None], quads_new, corners[sel]))
    area = area.at[sel].set(jnp.where(valid_new, qarea_new, area[sel]))
    valid = valid.at[sel].set(valid[sel] | valid_new)
    return cand._replace(corners=corners.reshape(Wn, Ks, 4, 2),
                         valid=valid.reshape(Wn, Ks),
                         area=area.reshape(Wn, Ks))


class CropView(NamedTuple):
    """A crop window ``[oy:oy+T, ox:ox+T]`` of a full ``(height, width)``
    image, sampled with GLOBAL coordinates.

    :func:`_bilinear` clamps against the FULL image dims and only the
    integer lattice lookup shifts into the crop — so every float operation
    (clip, floor, fractional weights, and all downstream refine/decode
    arithmetic on the coordinates) is bit-identical to sampling the full
    frame, as long as the looked-up lattice points lie inside the window
    (the ops/roi.py containment contract).
    """

    data: jnp.ndarray  # (T, T) float32 crop
    ox: jnp.ndarray  # () window origin, x
    oy: jnp.ndarray  # () window origin, y
    width: int  # full image W (static)
    height: int  # full image H (static)


class MatmulCropView(NamedTuple):
    """:class:`CropView` whose lattice lookups ride one-hot matmuls.

    TPU gathers serialize — the gather-heavy full-frame refine+decode
    program measured ~300 ms/batch (NOTES_ROUND3 §4).  For a VMEM-sized
    crop, the four lattice values of a bilinear sample can instead be
    *selected* with 0/1 one-hot matrices: a (2P, T) row-selection matmul
    pulls the two needed rows per sample onto the MXU, and an elementwise
    one-hot dot picks the columns.  Selection by 0/1 weights is exact (one
    nonzero term per sum; uint8-range values are exact in every matmul
    precision), so this is bit-identical to :class:`CropView` — purely a
    TPU speed form.
    """

    data: jnp.ndarray
    ox: jnp.ndarray
    oy: jnp.ndarray
    width: int
    height: int


class MatmulImage(NamedTuple):
    """A full image sampled via the one-hot matmul path (no crop offset);
    see :class:`MatmulCropView` for the mechanism and exactness argument."""

    data: jnp.ndarray  # (H, W) float32


def _matmul_values(img, xl0, yl0):
    """One-hot-matmul extraction of the 4 bilinear lattice values of
    ``img`` at integer local coords (xl0, yl0)."""
    H, W = img.shape
    shp = xl0.shape
    xl0 = xl0.reshape(-1)
    yl0 = yl0.reshape(-1)
    rows = jax.nn.one_hot(
        jnp.concatenate([yl0, yl0 + 1]), H, dtype=img.dtype
    )  # (2P, H)
    A = rows @ img  # (2P, W): rows y0 then rows y0+1, per sample
    cx0 = jax.nn.one_hot(xl0, W, dtype=img.dtype)
    cx1 = jax.nn.one_hot(xl0 + 1, W, dtype=img.dtype)
    P = xl0.shape[0]
    v00 = jnp.sum(A[:P] * cx0, -1)
    v01 = jnp.sum(A[:P] * cx1, -1)
    v10 = jnp.sum(A[P:] * cx0, -1)
    v11 = jnp.sum(A[P:] * cx1, -1)
    return tuple(v.reshape(shp) for v in (v00, v01, v10, v11))


def _bilinear_values(gray, x0, y0):
    """The four lattice values (v00, v01, v10, v11) at integer (x0, y0)."""
    if isinstance(gray, (CropView, MatmulCropView)):
        xl0 = x0 - jnp.asarray(gray.ox).astype(jnp.int32)
        yl0 = y0 - jnp.asarray(gray.oy).astype(jnp.int32)
        if isinstance(gray, MatmulCropView):
            return _matmul_values(gray.data, xl0, yl0)
        g = lambda yy, xx: gray.data[yy, xx]
        return g(yl0, xl0), g(yl0, xl0 + 1), g(yl0 + 1, xl0), g(yl0 + 1, xl0 + 1)
    if isinstance(gray, MatmulImage):
        return _matmul_values(gray.data, x0, y0)
    g = lambda yy, xx: gray[yy, xx]
    return g(y0, x0), g(y0, x0 + 1), g(y0 + 1, x0), g(y0 + 1, x0 + 1)


def _image_hw(gray):
    if isinstance(gray, (CropView, MatmulCropView)):
        return gray.height, gray.width
    if isinstance(gray, MatmulImage):
        return gray.data.shape
    return gray.shape


def _bilinear(gray, x, y):
    """Bilinear sample of a (H, W) image at float coords (clamped).

    ``gray`` may be a plain array (gather path) or a :class:`MatmulImage`
    (one-hot matmul path) — the two are bit-identical by construction.
    """
    H, W = _image_hw(gray)
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00, v01, v10, v11 = _bilinear_values(gray, x0, y0)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def refine_corners(gray, quad, params: DetectorParams):
    """Subpixel corner refinement via gradient-weighted edge line fits.

    AprilTag-style (CORNER_REFINE_APRILTAG, cam.py:130): for each quad edge,
    probe the image gradient along perpendicular offsets at S points on the
    edge, fit a total-least-squares line through the gradient-weighted
    centroids, and intersect adjacent edge lines to get the corners.
    """
    S = params.refine_samples
    O = params.refine_offsets
    ts = jnp.linspace(0.12, 0.88, S)
    offs = jnp.linspace(-(O // 2), O // 2, O)

    def edge_line(a, b):
        d = b - a
        length = jnp.linalg.norm(d)
        n = jnp.stack([-d[1], d[0]]) / jnp.maximum(length, 1e-6)
        base = a[None, :] + ts[:, None] * d[None, :]  # (S,2)
        pts = base[:, None, :] + offs[None, :, None] * n[None, None, :]  # (S,O,2)
        # directional gradient magnitude along the normal (central diff)
        step = 0.7
        gplus = _bilinear(gray, pts[..., 0] + step * n[0], pts[..., 1] + step * n[1])
        gminus = _bilinear(gray, pts[..., 0] - step * n[0], pts[..., 1] - step * n[1])
        w = jnp.abs(gplus - gminus)  # (S,O)
        wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-6)  # (S,1)
        centroid = jnp.sum(w[..., None] * pts, axis=1) / wsum  # (S,2)
        sw = jnp.sum(w, axis=1)  # per-sample total weight
        # weighted total least squares line through the centroids
        wn = sw / jnp.maximum(jnp.sum(sw), 1e-6)
        mean = jnp.sum(wn[:, None] * centroid, axis=0)
        dc = centroid - mean
        cov = jnp.einsum("s,si,sj->ij", wn, dc, dc)
        evals, evecs = jnp.linalg.eigh(cov)
        direction = evecs[:, 1]  # dominant direction
        normal = jnp.stack([-direction[1], direction[0]])
        # fall back to the coarse edge when gradients are washed out
        ok = jnp.sum(sw) > 1e-3 * S
        direction = jnp.where(ok, direction, d / jnp.maximum(length, 1e-6))
        normal = jnp.where(ok, normal, n)
        mean = jnp.where(ok, mean, (a + b) * 0.5)
        return mean, normal  # line: normal . (p - mean) = 0

    means, normals = jax.vmap(edge_line)(quad, jnp.roll(quad, -1, axis=0))

    def intersect(i):
        # corner i = intersection of edge (i-1) and edge i
        n1, p1 = normals[(i - 1) % 4], means[(i - 1) % 4]
        n2, p2 = normals[i], means[i]
        A = jnp.stack([n1, n2])
        b = jnp.array([jnp.dot(n1, p1), jnp.dot(n2, p2)])
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        sol = jnp.linalg.solve(A + 1e-12 * jnp.eye(2), b)
        return jnp.where(jnp.abs(det) > 1e-6, sol, quad[i])

    refined = jax.vmap(intersect)(jnp.arange(4))
    # reject refinements that moved corners implausibly far
    dist = jnp.linalg.norm(refined - quad, axis=1)
    return jnp.where((dist < params.refine_clamp_px)[:, None], refined, quad)


def refine_corners_subpix(gray, quad, params: DetectorParams):
    """OpenCV ``cornerSubPix``-style refinement (CORNER_REFINE_SUBPIX).

    The reference exposes this as a distinct detector method (cam.py:130 via
    the string registry); OpenCV's implementation iterates the gradient
    orthogonality condition: every gradient ``g(p)`` in a window around the
    corner ``q`` should be perpendicular to ``p - q``, giving the normal
    equations ``(sum w g g^T) q = sum w (g g^T) p``.  Separable Gaussian
    window weights, stop on ``subpix_iters`` (cornerRefinementMaxIterations,
    cam.py:133) or an update smaller than ``subpix_acc``
    (cornerRefinementMinAccuracy, cam.py:131).
    """
    win = params.subpix_win
    dx = jnp.arange(-win, win + 1, dtype=jnp.float32)
    ox, oy = jnp.meshgrid(dx, dx)
    w = jnp.exp(-((ox / win) ** 2)) * jnp.exp(-((oy / win) ** 2))

    def one(q0):
        def body(state):
            it, q, _ = state
            px = q[0] + ox
            py = q[1] + oy
            gx = (_bilinear(gray, px + 1.0, py) - _bilinear(gray, px - 1.0, py)) * 0.5
            gy = (_bilinear(gray, px, py + 1.0) - _bilinear(gray, px, py - 1.0)) * 0.5
            gxx = jnp.sum(w * gx * gx)
            gxy = jnp.sum(w * gx * gy)
            gyy = jnp.sum(w * gy * gy)
            bx = jnp.sum(w * (gx * gx * px + gx * gy * py))
            by = jnp.sum(w * (gx * gy * px + gy * gy * py))
            det = gxx * gyy - gxy * gxy
            qn = jnp.stack(
                [
                    (gyy * bx - gxy * by) / jnp.where(det == 0, 1.0, det),
                    (-gxy * bx + gxx * by) / jnp.where(det == 0, 1.0, det),
                ]
            )
            qn = jnp.where(jnp.abs(det) > 1e-9, qn, q)
            return it + 1, qn, jnp.linalg.norm(qn - q)

        def cond(state):
            it, _, move = state
            return (it < params.subpix_iters) & (move >= params.subpix_acc)

        init = (jnp.zeros((), jnp.int32), q0, jnp.asarray(jnp.inf, q0.dtype))
        _, q, _ = lax.while_loop(cond, body, init)
        # reject refinements that wandered implausibly far (same clamp as
        # the apriltag path)
        return jnp.where(jnp.linalg.norm(q - q0) < params.refine_clamp_px, q, q0)

    return jax.vmap(one)(quad)


def refine_quad(gray, quad, params: DetectorParams):
    """Dispatch corner refinement on ``params.corner_refine``.

    ``"apriltag"`` -> :func:`refine_corners` (edge line fits),
    ``"subpix"`` -> :func:`refine_corners_subpix` (cornerSubPix iteration),
    ``"none"`` -> the raw quad (reference CORNER_REFINE_NONE semantics).
    """
    if params.corner_refine == "apriltag":
        return refine_corners(gray, quad, params)
    if params.corner_refine == "subpix":
        return refine_corners_subpix(gray, quad, params)
    if params.corner_refine == "none":
        return quad
    raise ValueError(f"unknown corner_refine kind: {params.corner_refine!r}")


def _otsu(values, bins: int = 64):
    """Otsu's threshold of a 1-D intensity sample (fixed-bin histogram)."""
    lo = values.min()
    hi = values.max()
    span = jnp.maximum(hi - lo, 1e-6)
    idx = jnp.clip(((values - lo) / span * bins).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.float32).at[idx].add(1.0)
    centers = lo + (jnp.arange(bins, dtype=jnp.float32) + 0.5) * (span / bins)
    w0 = jnp.cumsum(hist)
    total = w0[-1]
    s0 = jnp.cumsum(hist * centers)
    stotal = s0[-1]
    w1 = total - w0
    mu0 = s0 / jnp.maximum(w0, 1e-6)
    mu1 = (stotal - s0) / jnp.maximum(w1, 1e-6)
    var_between = w0 * w1 * (mu0 - mu1) ** 2
    k = jnp.argmax(var_between)
    return lo + (k.astype(jnp.float32) + 1.0) * (span / bins)


def _quad_homography(quad, n_cells: int):
    """Homography mapping marker-cell coords (u, v) in [0, n_cells] to image.

    Cell (0,0) is the outer border's top-left; quad corners sit at the outer
    pixel centers, so the grid spans quad corners exactly.
    """
    from .pnp import homography_4pt

    src = jnp.array(
        [[0.0, 0.0], [n_cells, 0.0], [n_cells, n_cells], [0.0, n_cells]],
        jnp.float32,
    )
    return homography_4pt(src, quad)


def decode_one(gray, quad, is_valid, table, n_bits: int, params: DetectorParams):
    """Decode a single quad against the dictionary (see :func:`decode_quads`).

    Exposed separately so the ROI pipeline can vmap it with a DIFFERENT
    image per candidate (each candidate samples its own crop).
    """
    cells = n_bits + 2
    S = params.decode_samples
    # strict matching unless a budget was resolved (resolve_error_correction)
    ec_bits = params.error_correction_bits if params.error_correction_bits is not None else 0

    border_mask = jnp.zeros((cells, cells), bool).at[0, :].set(True)
    border_mask = border_mask.at[-1, :].set(True).at[:, 0].set(True).at[:, -1].set(True)
    max_border_errs = jnp.floor(params.max_border_err_rate * (4 * cells - 4))

    Hm = _quad_homography(quad, cells)

    def attempt(frac):
        """Decode with bit samples spanning the central ``frac`` of each
        cell.  Full-cell sampling (frac = 1) averages the most pixels —
        best under noise; a tight central window resists cross-cell
        bleed when cells are only a couple of pixels wide."""
        lin = ((jnp.arange(S) + 0.5) / S) * frac + (1.0 - frac) * 0.5

        def cell_samples(r, c):
            u = c + lin[None, :]
            v = r + lin[:, None]
            ones = jnp.ones_like(u * v)
            uv1 = jnp.stack([u * ones, v * ones, ones], axis=-1)  # (S,S,3)
            p = jnp.einsum("ij,stj->sti", Hm, uv1)
            x = p[..., 0] / p[..., 2]
            y = p[..., 1] / p[..., 2]
            return _bilinear(gray, x, y)  # (S,S)

        rr, cc = jnp.mgrid[0:cells, 0:cells]
        samples = jax.vmap(jax.vmap(cell_samples))(
            rr.astype(jnp.float32), cc.astype(jnp.float32)
        )  # (cells, cells, S, S)
        means = samples.mean(axis=(2, 3))

        # Otsu threshold over all sampled intensities + per-cell
        # majority — OpenCV's extraction scheme; far more robust on
        # oblique/blurred quads than a midrange threshold of cell means
        # (recall parity with cv2 came from exactly this change).
        tau = _otsu(samples.reshape(-1))
        bits = (jnp.mean(samples > tau, axis=(2, 3)) > 0.5).astype(jnp.uint8)

        border_errs = jnp.sum(jnp.where(border_mask, bits, 0))
        border_ok = border_errs <= max_border_errs
        # contrast gate: a real marker has distinctly dark border cells
        contrast_ok = (means.max() - means.min()) > params.min_cell_contrast

        inner = bits[1:-1, 1:-1].reshape(-1)  # (n_bits^2,) row-major
        dists = jnp.sum(inner[None, None, :] != table, axis=-1)  # (size, 4)
        best_flat = jnp.argmin(dists.reshape(-1))
        best_id = (best_flat // 4).astype(jnp.int32)
        best_rot = (best_flat % 4).astype(jnp.int32)
        best_dist = dists.reshape(-1)[best_flat]
        ok = is_valid & border_ok & contrast_ok & (best_dist <= ec_bits)
        return best_id, best_rot, ok

    # Primary pass: full-cell sampling.  Second chance for quads it
    # rejects: a central-half window — at 12-16 px markers (2-3 px
    # cells) full-cell samples straddle cell boundaries and flip 1-2
    # bits, which strict matching (correctly) refuses to correct.  The
    # matching itself stays strict in BOTH passes, so the zero-false-id
    # property is preserved; measured +3 true detections on the oblique
    # cube scenes with no change elsewhere.
    id1, rot1, ok1 = attempt(1.0)
    id2, rot2, ok2 = attempt(0.5)
    best_id = jnp.where(ok1, id1, id2)
    best_rot = jnp.where(ok1, rot1, rot2)
    ok = ok1 | ok2
    # roll corners so index 0 = canonical top-left
    idx = (jnp.arange(4) + best_rot) % 4
    corners = quad[idx]
    return best_id, best_rot, corners, ok


def decode_quads(gray, quads, valid, table, n_bits: int, params: DetectorParams):
    """Sample the bit grid of each quad and match against the dictionary.

    ``table``: (dict_size, 4, n_bits*n_bits) uint8 rotation table.
    Returns (ids, rotations, corners_canonical, ok): corners are rolled so
    index 0 is the canonical top-left (OpenCV convention).
    """
    return jax.vmap(
        lambda q, v: decode_one(gray, q, v, table, n_bits, params)
    )(quads, valid)


class Detections(NamedTuple):
    corners: jnp.ndarray  # (D, 4, 2) canonical order, subpixel
    ids: jnp.ndarray  # (D,) int32
    valid: jnp.ndarray  # (D,) bool
    score: jnp.ndarray  # (D,) float32 (quad area; larger = better)


def dedup_and_compact(corners, ids, ok, area, params: DetectorParams) -> Detections:
    """Cross-window duplicate suppression + compaction to fixed capacity.

    A candidate is suppressed when a better (larger-area) valid candidate
    sits within half its edge length; survivors are compacted best-first
    into ``params.max_detections`` slots.
    """
    centers = corners.mean(axis=1)
    d2 = jnp.sum((centers[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    edge = jnp.sqrt(jnp.maximum(area, 1.0))  # ~ quad edge length
    close = d2 < (params.dedup_radius_rate * jnp.minimum(edge[:, None], edge[None, :])) ** 2
    better = (area[None, :] > area[:, None]) | (
        (area[None, :] == area[:, None])
        & (jnp.arange(len(area))[None, :] < jnp.arange(len(area))[:, None])
    )
    suppressed = jnp.any(close & better & ok[None, :], axis=1)
    keep = ok & ~suppressed

    order = jnp.argsort(jnp.where(keep, -area, jnp.inf))
    sel = order[: params.max_detections]
    return Detections(
        corners=corners[sel], ids=ids[sel], valid=keep[sel], score=area[sel]
    )


@partial(jax.jit, static_argnames=("params", "n_bits"))
def detect_markers(gray, table, n_bits: int, params: DetectorParams) -> Detections:
    """Full single-image detection over all threshold window sizes.

    ``gray``: (H, W) float32 preprocessed grayscale.  Returns fixed-capacity
    detections (``params.max_detections``) with a validity mask; duplicates
    across window sizes are suppressed by center proximity (best area wins).
    """
    H, W = gray.shape

    # The threshold sweep differs only in the (static) window size; every
    # later stage runs batched over the window axis in ONE program — 7x fewer
    # dispatches and a much smaller XLA graph than a per-window loop.
    if resolve_pallas(params):
        from .pallas.threshold import multi_threshold

        Hp = -(-H // 8) * 8  # the kernel strips rows in groups of 8
        g = jnp.pad(gray, ((0, Hp - H), (0, 0)), mode="edge") if Hp != H else gray
        fgs = multi_threshold(g, params.win_sizes, params.thresh_const)[:, :H, :] > 0.5
    else:
        fgs = jnp.stack(
            [adaptive_threshold(gray, w, params.thresh_const) for w in params.win_sizes]
        )  # (Wn, H, W)
    labels = jax.vmap(lambda f: connected_components(f, params.ccl_passes))(fgs)
    cand = jax.vmap(lambda l: extract_quads(l, params))(labels)

    Wn, K = len(params.win_sizes), params.max_candidates
    K2 = params.max_candidates_4conn
    if K2 > 0:
        # 4-connected SPLIT candidates (same slot layout as the C packed2
        # extractor: per window, K 8-conn slots then K2 split slots)
        labels4 = jax.vmap(
            lambda f: connected_components(f, params.ccl_passes, diagonal=False)
        )(fgs)
        cand4 = jax.vmap(
            lambda l8, l4: extract_split_quads(l8, l4, params)
        )(labels, labels4)
        cand = QuadCandidates(*(
            jnp.concatenate([a, b], axis=1)
            for a, b in zip(cand, cand4)
        ))
    Ks = K + K2 if K2 > 0 else K

    if params.max_refit_candidates > 0:
        # degenerate-extraction recovery, mirroring the hybrid modes' host
        # hull re-fit (see refit_degenerate_quads; decode is the backstop)
        l4 = labels4 if K2 > 0 else labels
        cand = refit_degenerate_quads(cand, labels, l4, params)

    corners_flat = cand.corners.reshape(Wn * Ks, 4, 2)
    refined = jax.vmap(lambda q: refine_quad(gray, q, params))(corners_flat)
    ids, rots, corners, ok = decode_quads(
        gray, refined, cand.valid.reshape(Wn * Ks), table, n_bits, params
    )
    area = cand.area.reshape(Wn * Ks)

    return dedup_and_compact(corners, ids, ok, area, params)

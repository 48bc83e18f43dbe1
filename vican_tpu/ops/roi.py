"""ROI-crop assembly for the perception pipeline's refine/decode stage.

The refine/decode/PnP device program only reads pixels near the candidate
quads, which the host already knows before dispatch (it extracted them).
Shipping the full preprocessed frame (≈0.9 MB at 720p) is therefore pure
waste on a slow host link — the dominant cost of the r3 device mode
(VERDICT r3 item 1; the reference's mp.Pool+OpenCV pipeline measured
36 img/s on the bench host against our 17).  This module clusters the valid
candidates of each image into shared fixed-size crop WINDOWS (one per
marker site — the same marker detected under all 7 threshold windows shares
one crop), sized in tiers so a batch compiles a handful of programs.

Exactness contract: sampling a crop locally is bit-identical to sampling
the full frame IF every coordinate the device will touch lies inside the
crop window, with the window edge coinciding with the image edge wherever
the (margin-expanded) candidate bbox crosses it — then the local bilinear
clamp reproduces the global clamp.  ``_fit_axis``/``_contains`` encode
exactly that predicate; sites that no tier can hold make the whole batch
fall back to the full-frame program (rare: a site bigger than the top tier).

The margin bounds the sampling excursion beyond the raw quad: AprilTag
refine probes ``refine_offsets//2 + 0.7`` px past an edge, refined corners
move at most ``refine_clamp_px``, decode samples inside the refined hull,
and bilinear reads one lattice step further — 8 px covers the defaults with
slack.  (cornerSubPix refinement iterates unboundedly, so ROI mode is only
used with the apriltag/none refiners — perception falls back otherwise.)

Reference parity: vican/cam.py:147 runs detectMarkers on the full frame;
the crop windows here are an internal transport optimization with no
behavioral surface.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["RoiBatch", "TileBatch", "cluster_rois", "build_roi_batch",
           "build_crop_meta", "build_tile_batch", "TILE"]

# containment slack: local hi-clamp is W-1.001; 1.26 keeps every in-window
# sample strictly below it even after float rounding
_SLACK = 1.26


def _fit_axis(lo: float, hi: float, T: int, L: int):
    """Feasible crop origin along one axis, or None.

    ``[lo, hi]``: the margin-expanded candidate bbox (may cross the image);
    ``T``: tier size; ``L``: image extent.  Pins the window to an image
    edge the bbox crosses (so local clamp == global clamp there).
    """
    if T > L:
        return None
    lo_pin = lo < 0.0
    hi_pin = hi > L - _SLACK
    omin = (L - T) if hi_pin else max(0, int(np.ceil(hi + _SLACK - T)))
    omax = 0 if lo_pin else min(L - T, int(np.floor(lo)))
    if omin > omax:
        return None
    c = int(round((lo + hi) / 2.0 - T / 2.0))
    return min(max(c, omin), omax)


def _contains(o: int, T: int, lo: float, hi: float, L: int) -> bool:
    """Whether window [o, o+T) satisfies the exactness predicate for [lo, hi]."""
    left_ok = (o == 0) if lo < 0.0 else (o <= lo)
    right_ok = (o + T == L) if hi > L - _SLACK else (hi <= o + T - _SLACK)
    return left_ok and right_ok


def cluster_rois(quads: np.ndarray, valid: np.ndarray, H: int, W: int,
                 tiers: tuple, margin: float):
    """Cluster one image's valid candidates into shared crop windows.

    ``quads``: (Q, 4, 2) float corners; ``valid``: (Q,) bool.
    Returns ``(rois, assign)`` where ``rois`` is a list of
    ``(tier_idx, ox, oy)`` and ``assign`` maps candidate index ``q`` to its
    roi index — or None when some candidate fits no tier (batch fallback).
    Candidates are clustered largest-first so a site's biggest variant
    claims the window and its duplicates join it.
    """
    idxs = np.nonzero(valid)[0]
    if idxs.size == 0:
        return [], {}
    xmin = quads[idxs, :, 0].min(1) - margin
    xmax = quads[idxs, :, 0].max(1) + margin
    ymin = quads[idxs, :, 1].min(1) - margin
    ymax = quads[idxs, :, 1].max(1) + margin
    span = np.maximum(xmax - xmin, ymax - ymin)
    order = np.argsort(-span)

    rois: list = []  # (tier_idx, ox, oy)
    assign: dict = {}
    for i in order:
        q = int(idxs[i])
        bx0, bx1, by0, by1 = float(xmin[i]), float(xmax[i]), float(ymin[i]), float(ymax[i])
        hit = None
        for r, (ti, ox, oy) in enumerate(rois):
            T = tiers[ti]
            if _contains(ox, T, bx0, bx1, W) and _contains(oy, T, by0, by1, H):
                hit = r
                break
        if hit is None:
            for ti, T in enumerate(tiers):
                ox = _fit_axis(bx0, bx1, T, W)
                oy = _fit_axis(by0, by1, T, H)
                if ox is not None and oy is not None:
                    hit = len(rois)
                    rois.append((ti, ox, oy))
                    break
            else:
                return None, None  # no tier holds this site: full-frame fallback
        assign[q] = hit
    return rois, assign


class RoiBatch:
    """Assembled per-batch ROI buffers, one entry per OCCUPIED tier.

    ``crops[t]``: (Rcap, T*T) uint8 — flattened so the minor dim is large
    (a (..., 64) minor axis pads to 128 in the TPU transfer layout and
    would double the shipped bytes).
    ``meta[t]``: (14, Ncap) float32, candidate-major columns:
    rows 0-7 GLOBAL quad coords (x0,y0,...,x3,y3), 8 valid, 9 area,
    10 slot (b*Q + q), 11 crop index, 12-13 window origin (ox, oy).
    Padding columns have valid=0 and slot=B*Q (the scatter trash row).
    """

    def __init__(self, tiers, crops, meta, caps):
        self.tiers = tiers  # tier sizes actually used, ascending
        self.crops = crops
        self.meta = meta
        self.caps = caps  # tuple of (T, Rcap, Ncap) — the program cache key

    @property
    def upload_bytes(self) -> int:
        return sum(c.nbytes for c in self.crops) + sum(m.nbytes for m in self.meta)


def _round_up(n: int, q: int) -> int:
    return -(-max(n, 1) // q) * q


def _fit_axis_vec(lo: np.ndarray, hi: np.ndarray, T: int, L: int):
    """Vectorized :func:`_fit_axis` over candidate arrays.

    Returns ``(feasible (N,) bool, origin (N,) int64)`` — origins are only
    meaningful where feasible.  Same arithmetic as the scalar function.
    """
    if T > L:
        z = np.zeros(lo.shape, np.int64)
        return np.zeros(lo.shape, bool), z
    lo_pin = lo < 0.0
    hi_pin = hi > L - _SLACK
    omin = np.where(hi_pin, L - T,
                    np.maximum(0, np.ceil(hi + _SLACK - T).astype(np.int64)))
    omax = np.where(lo_pin, 0,
                    np.minimum(L - T, np.floor(lo).astype(np.int64)))
    c = np.round((lo + hi) / 2.0 - T / 2.0).astype(np.int64)
    return omin <= omax, np.clip(c, omin, omax)


def _cand_windows(quads, valid, H, W, params):
    """Vectorized per-candidate window fit (shared by build_crop_meta /
    build_tile_batch): flattens the valid candidates of a (B, Q) batch and
    fits each against the tier ladder.

    Returns ``(bidx, qidx, reach, tier_of, ox, oy)`` over the N valid
    candidates (``reach``: (N, 4) = margin-expanded [x0, x1, y0, y1]),
    or None when some candidate fits no tier.
    """
    B, Q = valid.shape
    bidx, qidx = np.nonzero(valid)
    if bidx.size == 0:
        return bidx, qidx, np.zeros((0, 4)), bidx, bidx, bidx
    q = quads[bidx, qidx]  # (N, 4, 2)
    margin = float(params.roi_margin)
    xmin = q[:, :, 0].min(1) - margin
    xmax = q[:, :, 0].max(1) + margin
    ymin = q[:, :, 1].min(1) - margin
    ymax = q[:, :, 1].max(1) + margin
    tiers = tuple(params.roi_tiers)
    N = bidx.size
    tier_of = np.full(N, -1, np.int64)
    ox = np.zeros(N, np.int64)
    oy = np.zeros(N, np.int64)
    for ti, T in enumerate(tiers):
        okx, cx = _fit_axis_vec(xmin, xmax, T, W)
        oky, cy = _fit_axis_vec(ymin, ymax, T, H)
        take = (tier_of < 0) & okx & oky
        tier_of[take] = ti
        ox[take] = cx[take]
        oy[take] = cy[take]
    if (tier_of < 0).any():
        return None
    return bidx, qidx, np.stack([xmin, xmax, ymin, ymax], 1), tier_of, ox, oy


def _tier_metas(quads, areas, B, Q, tiers, bidx, qidx, tier_of, ox, oy,
                crop_of=None):
    """Pack per-tier (14, Ncap) meta arrays (see :class:`RoiBatch` layout).

    ``crop_of``: row-11 value per candidate (crop index for the uploaded-
    window path); defaults to the image index (frame-sliced paths).
    """
    caps, metas = [], []
    row11 = bidx if crop_of is None else crop_of
    for t in range(len(tiers)):
        sel = np.nonzero(tier_of == t)[0]
        if sel.size == 0:
            continue
        Ncap = _round_up(sel.size, 64)
        meta = np.zeros((14, Ncap), np.float32)
        meta[10] = B * Q  # padding columns scatter to the trash row
        n = sel.size
        meta[0:8, :n] = quads[bidx[sel], qidx[sel]].reshape(n, 8).T
        meta[8, :n] = 1.0
        meta[9, :n] = areas[bidx[sel], qidx[sel]]
        meta[10, :n] = bidx[sel] * Q + qidx[sel]
        meta[11, :n] = row11[sel]
        meta[12, :n] = ox[sel]
        meta[13, :n] = oy[sel]
        caps.append((tiers[t], Ncap))
        metas.append(meta)
    return tuple(caps), metas


def build_crop_meta(quads: np.ndarray, valid: np.ndarray, areas: np.ndarray,
                    H: int, W: int, params):
    """Per-candidate crop-window metadata for DEVICE-RESIDENT frames.

    The device/host modes keep the full frame on device (it crossed the
    link for thresholding anyway), so refine/decode can slice a static
    ``T x T`` window per candidate with ``lax.dynamic_slice`` instead of
    gathering from the megapixel frame — same exactness predicate as the
    uploaded-crop path, no window sharing needed (slicing is free).

    Returns ``(caps, metas)`` with ``caps = ((T, Ncap), ...)`` per occupied
    tier and ``metas[t]`` a (14, Ncap) float32: rows 0-7 global quad,
    8 valid, 9 area, 10 slot (b*Q + q), 11 image index, 12-13 window
    origin — or None when a candidate fits no tier (full-frame fallback).
    """
    B, Q = valid.shape
    cw = _cand_windows(quads, valid, H, W, params)
    if cw is None:
        return None, None
    bidx, qidx, _reach, tier_of, ox, oy = cw
    return _tier_metas(quads, areas, B, Q, tuple(params.roi_tiers),
                       bidx, qidx, tier_of, ox, oy)


# Tile-union upload granularity (px).  Smaller tiles hug the candidate
# regions tighter (less upload) at the cost of more scatter rows; the
# payload minor dim TILE*TILE must stay >= 128 (axon tunnel tiled-layout
# padding, CLAUDE.md) — so 16 is the practical floor.  Read once at
# import; env knob for the tuning sweep (benchmarks/roi_tuning.py).
TILE = max(16, int(os.environ.get("VICAN_TPU_ROI_TILE", 0) or 32))


class TileBatch:
    """Tile-union upload for the roi mode: the bytes that cross the link
    are the UNION of the candidate reach regions on a ``TILE``-px grid —
    no window-overlap duplication and no tier padding (measured ~2.9x
    fewer bytes than shared crop windows on the marker-dense bench scene,
    where windows overlap heavily).  The device scatters the tiles back
    into a zero frame batch and runs the SAME crop-view refine/decode
    program as the device-resident-frame path; pixels outside the union
    are zero but provably never sampled (the reach covers every
    coordinate refine/decode can touch, bilinear lattice included).

    ``tiles``: (Tcap, TILE*TILE) uint8 payload (flat minor dim: a small
    minor axis pads to 128 in the TPU transfer layout).
    ``tidx``: (Tcap,) int32 flat index into the (B, Ht, Wt) tile grid of
    the reconstructed (B, Hp, Wp) frame batch; padding rows point at the
    trash row ``B*Ht*Wt``.
    ``caps``/``metas``: per-tier crop-window metadata (RoiBatch layout,
    row 11 = image index), window math against the TRUE image dims.
    """

    def __init__(self, caps, metas, tiles, tidx, frame_hw):
        self.caps = caps
        self.metas = metas
        self.tiles = tiles
        self.tidx = tidx
        self.frame_hw = frame_hw  # (Hp, Wp) reconstructed frame dims

    @property
    def upload_bytes(self) -> int:
        return (self.tiles.nbytes + self.tidx.nbytes
                + sum(m.nbytes for m in self.metas))


def build_tile_batch(gray: np.ndarray, quads: np.ndarray, valid: np.ndarray,
                     areas: np.ndarray, H: int, W: int, params,
                     tile_cap_round: int = 512) -> TileBatch | None:
    """Assemble the tile-union device-program inputs for one image batch.

    Returns None when a candidate fits no tier (full-frame fallback).
    """
    B, Q = valid.shape
    cw = _cand_windows(quads, valid, H, W, params)
    if cw is None:
        return None
    bidx, qidx, reach, tier_of, ox, oy = cw
    caps, metas = _tier_metas(quads, areas, B, Q, tuple(params.roi_tiers),
                              bidx, qidx, tier_of, ox, oy)

    Ht, Wt = -(-H // TILE), -(-W // TILE)
    Hp, Wp = Ht * TILE, Wt * TILE
    if bidx.size == 0:
        return TileBatch(caps, metas, np.zeros((0, TILE * TILE), np.uint8),
                         np.zeros((0,), np.int32), (Hp, Wp))

    # occupied tiles: union of the candidate reach boxes (+2 px slack over
    # the window-containment margin — bilinear reads one lattice step past a
    # touched coordinate and the tiles are cheap at this granularity),
    # clamped to the true image (samples clamp to [0, L-1.001] globally)
    x0 = np.clip(np.floor(reach[:, 0]) - 2, 0, W - 1).astype(np.int64) // TILE
    x1 = np.clip(np.ceil(reach[:, 1]) + 2, 0, W - 1).astype(np.int64) // TILE
    y0 = np.clip(np.floor(reach[:, 2]) - 2, 0, H - 1).astype(np.int64) // TILE
    y1 = np.clip(np.ceil(reach[:, 3]) + 2, 0, H - 1).astype(np.int64) // TILE
    # 2-D difference trick: +1 at (y0, x0), -1 at (y0, x1+1)/(y1+1, x0),
    # +1 at (y1+1, x1+1); double cumsum > 0 == union of the boxes
    diff = np.zeros((B, Ht + 1, Wt + 1), np.int32)
    np.add.at(diff, (bidx, y0, x0), 1)
    np.add.at(diff, (bidx, y0, x1 + 1), -1)
    np.add.at(diff, (bidx, y1 + 1, x0), -1)
    np.add.at(diff, (bidx, y1 + 1, x1 + 1), 1)
    occ = diff.cumsum(1).cumsum(2)[:, :Ht, :Wt] > 0
    tb, ty, tx = np.nonzero(occ)
    n = tb.size

    Tcap = _round_up(n, tile_cap_round)
    tiles = np.zeros((Tcap, TILE * TILE), np.uint8)
    tidx = np.full((Tcap,), B * Ht * Wt, np.int32)  # padding -> trash row
    tidx[:n] = (tb * Ht + ty) * Wt + tx
    # full tiles via one strided fancy-gather; partial edge tiles (image
    # dims not TILE-multiples) individually — zeros beyond the true image
    # are never sampled (clamp at L-1.001 keeps the bilinear lattice inside)
    Hf, Wf = H // TILE, W // TILE
    full = (ty < Hf) & (tx < Wf)
    if full.any():
        sB, sH, sW = gray.strides
        view = np.lib.stride_tricks.as_strided(
            gray, (B, Hf, Wf, TILE, TILE), (sB, sH * TILE, sW * TILE, sH, sW),
            writeable=False)
        tiles[: n][full] = view[tb[full], ty[full], tx[full]].reshape(-1, TILE * TILE)
    for i in np.nonzero(~full)[0]:
        b, yy, xx = tb[i], ty[i] * TILE, tx[i] * TILE
        h = min(TILE, H - yy)
        w = min(TILE, W - xx)
        tiles[i].reshape(TILE, TILE)[:h, :w] = gray[b, yy:yy + h, xx:xx + w]
    return TileBatch(caps, metas, tiles, tidx, (Hp, Wp))


def build_roi_batch(gray: np.ndarray, quads: np.ndarray, valid: np.ndarray,
                    areas: np.ndarray, H: int, W: int, params) -> RoiBatch | None:
    """Assemble the ROI device-program inputs for one image batch.

    ``gray``: (B, H', W') uint8 (H' >= H allowed — only [:H, :W] is read).
    Returns None when any site exceeds the top tier (caller falls back to
    the full-frame program for this batch).
    """
    B, Q = valid.shape
    tiers = tuple(params.roi_tiers)
    margin = float(params.roi_margin)

    per_tier: dict = {t: {"rois": [], "cands": []} for t in range(len(tiers))}
    for b in range(B):
        rois, assign = cluster_rois(quads[b], valid[b], H, W, tiers, margin)
        if rois is None:
            return None
        base = {}  # image-roi index -> (tier, tier-local roi index)
        for r, (ti, ox, oy) in enumerate(rois):
            pt = per_tier[ti]
            base[r] = (ti, len(pt["rois"]))
            pt["rois"].append((b, ox, oy))
        for q, r in assign.items():
            ti, rlocal = base[r]
            per_tier[ti]["cands"].append((b, q, rlocal))

    used = [t for t in range(len(tiers)) if per_tier[t]["cands"]]
    crops_l, meta_l, caps = [], [], []
    for t in used:
        T = tiers[t]
        rois = per_tier[t]["rois"]
        cands = per_tier[t]["cands"]
        Rcap = _round_up(len(rois), 8)
        Ncap = _round_up(len(cands), 64)
        crops = np.zeros((Rcap, T * T), np.uint8)
        for r, (b, ox, oy) in enumerate(rois):
            crops[r] = gray[b, oy:oy + T, ox:ox + T].reshape(-1)
        meta = np.zeros((14, Ncap), np.float32)
        meta[10] = B * Q  # padding columns scatter to the trash row
        for i, (b, q, rlocal) in enumerate(cands):
            b_r, ox, oy = rois[rlocal]
            assert b_r == b
            meta[0:8, i] = quads[b, q].reshape(-1)  # GLOBAL coords (CropView)
            meta[8, i] = 1.0
            meta[9, i] = areas[b, q]
            meta[10, i] = b * Q + q
            meta[11, i] = rlocal
            meta[12, i] = ox
            meta[13, i] = oy
        crops_l.append(crops)
        meta_l.append(meta)
        caps.append((T, Rcap, Ncap))
    return RoiBatch(tuple(tiers[t] for t in used), crops_l, meta_l, tuple(caps))

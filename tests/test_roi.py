"""ROI-crop transport: clustering invariants, exact samplers, mode equality.

The "roi" perception mode (VERDICT r3 item 1) never ships the frame; its
correctness rests on two contracts tested here:

1. ops/roi.py clustering — every candidate's margin-expanded bbox lies
   inside its assigned crop window, with the window edge pinned to the
   image edge wherever the bbox crosses it (so local bilinear clamping
   reproduces global clamping bit-for-bit).
2. ops/detect.py samplers — CropView (gather) and MatmulCropView /
   MatmulImage (one-hot matmul) are bit-identical to sampling the full
   frame directly.

Reference: vican/cam.py:147 runs detectMarkers on full frames; the ROI
transport must be behaviorally invisible.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vican_tpu.ops.detect import (
    CropView,
    DetectorParams,
    MatmulCropView,
    MatmulImage,
    _bilinear,
    adaptive_threshold,
)
from vican_tpu.ops.roi import _SLACK, build_roi_batch, cluster_rois


def _rand_quads(rng, n, H, W, span_lo=10, span_hi=60):
    quads = np.zeros((n, 4, 2), np.float32)
    for i in range(n):
        cx = rng.uniform(0, W)
        cy = rng.uniform(0, H)
        s = rng.uniform(span_lo, span_hi) / 2
        quads[i] = [[cx - s, cy - s], [cx + s, cy - s], [cx + s, cy + s], [cx - s, cy + s]]
    return quads


class TestClusterRois:
    def test_containment_invariants(self):
        rng = np.random.default_rng(0)
        H, W = 360, 640
        tiers = (64, 128, 192)
        margin = 8.0
        for trial in range(20):
            quads = _rand_quads(rng, 30, H, W)
            valid = rng.random(30) < 0.8
            rois, assign = cluster_rois(quads, valid, H, W, tiers, margin)
            assert rois is not None
            assert set(assign) == set(np.nonzero(valid)[0])
            for q, r in assign.items():
                ti, ox, oy = rois[r]
                T = tiers[ti]
                assert 0 <= ox <= W - T and 0 <= oy <= H - T
                bx0 = quads[q, :, 0].min() - margin
                bx1 = quads[q, :, 0].max() + margin
                by0 = quads[q, :, 1].min() - margin
                by1 = quads[q, :, 1].max() + margin
                # exactness predicate: window contains the bbox, pinned to
                # the image edge where the bbox crosses it
                assert (ox == 0) if bx0 < 0 else (ox <= bx0)
                assert (oy == 0) if by0 < 0 else (oy <= by0)
                assert (ox + T == W) if bx1 > W - _SLACK else (bx1 <= ox + T - _SLACK)
                assert (oy + T == H) if by1 > H - _SLACK else (by1 <= oy + T - _SLACK)

    def test_duplicate_sites_share_windows(self):
        """7 near-identical window-sweep variants of one site: one crop."""
        rng = np.random.default_rng(1)
        base = _rand_quads(rng, 1, 200, 300, span_lo=30, span_hi=30)[0]
        quads = np.stack([base + rng.normal(0, 0.5, (4, 2)) for _ in range(7)])
        rois, assign = cluster_rois(
            quads.astype(np.float32), np.ones(7, bool), 360, 640, (64, 128), 8.0
        )
        assert len(rois) == 1 and len(assign) == 7

    def test_oversized_site_returns_none(self):
        quads = np.array([[[10, 10], [500, 10], [500, 500], [10, 500]]], np.float32)
        rois, assign = cluster_rois(quads, np.ones(1, bool), 720, 1280, (64, 128), 8.0)
        assert rois is None and assign is None

    def test_tier_too_big_for_image(self):
        """An image smaller than every tier cannot host any window."""
        quads = np.array([[[5, 5], [25, 5], [25, 25], [5, 25]]], np.float32)
        rois, assign = cluster_rois(quads, np.ones(1, bool), 40, 40, (64, 128), 8.0)
        assert rois is None

    def test_build_roi_batch_crops_match_image(self):
        rng = np.random.default_rng(2)
        H, W = 180, 320
        gray = rng.integers(0, 256, (2, H, W)).astype(np.uint8)
        quads = np.stack([_rand_quads(rng, 5, H, W) for _ in range(2)])
        valid = np.ones((2, 5), bool)
        areas = rng.uniform(100, 400, (2, 5)).astype(np.float32)
        params = DetectorParams(roi_tiers=(64, 128), roi_margin=8)
        rb = build_roi_batch(gray, quads, valid, areas, H, W, params)
        assert rb is not None
        for (T, Rcap, Ncap), crops, meta in zip(rb.caps, rb.crops, rb.meta):
            n = int((meta[8] > 0.5).sum())
            for i in range(n):
                b = int(meta[10, i]) // valid.shape[1]
                ci = int(meta[11, i])
                ox, oy = int(meta[12, i]), int(meta[13, i])
                np.testing.assert_array_equal(
                    crops[ci].reshape(T, T), gray[b, oy:oy + T, ox:ox + T]
                )
                # meta carries the candidate's global quad
                q = int(meta[10, i]) % valid.shape[1]
                np.testing.assert_allclose(
                    meta[0:8, i].reshape(4, 2), quads[b, q], atol=0
                )


class TestTileBatch:
    """Tile-union transport: the reconstructed frame must carry the true
    pixel at EVERY coordinate refine/decode can touch (reach union), and
    the per-candidate window metadata must satisfy the same exactness
    predicate as the uploaded-window path."""

    def _reconstruct(self, tb, B):
        from vican_tpu.ops.roi import TILE

        Hp, Wp = tb.frame_hw
        Ht, Wt = Hp // TILE, Wp // TILE
        grid = np.zeros((B * Ht * Wt + 1, TILE * TILE), np.uint8)
        grid[tb.tidx] = tb.tiles
        return (grid[: B * Ht * Wt].reshape(B, Ht, Wt, TILE, TILE)
                .transpose(0, 1, 3, 2, 4).reshape(B, Hp, Wp))

    def test_reach_union_covered_and_windows_exact(self):
        from vican_tpu.ops.roi import build_tile_batch

        rng = np.random.default_rng(7)
        B, H, W = 3, 190, 330  # not TILE multiples: partial edge tiles
        gray = rng.integers(0, 256, (B, H, W)).astype(np.uint8)
        quads = np.stack([_rand_quads(rng, 8, H, W) for _ in range(B)])
        valid = rng.random((B, 8)) < 0.8
        areas = rng.uniform(100, 400, (B, 8)).astype(np.float32)
        params = DetectorParams(roi_tiers=(64, 128), roi_margin=8)
        tb = build_tile_batch(gray, quads, valid, areas, H, W, params)
        assert tb is not None
        frames = self._reconstruct(tb, B)
        m = float(params.roi_margin)
        seen = 0
        for cap, meta in zip(tb.caps, tb.metas):
            T, Ncap = cap
            n = int((meta[8] > 0.5).sum())
            seen += n
            for i in range(n):
                b = int(meta[10, i]) // valid.shape[1]
                q = int(meta[10, i]) % valid.shape[1]
                assert int(meta[11, i]) == b  # row 11 = image index
                ox, oy = int(meta[12, i]), int(meta[13, i])
                assert 0 <= ox <= W - T and 0 <= oy <= H - T
                x0 = max(0, int(np.floor(quads[b, q, :, 0].min() - m)))
                x1 = min(W - 1, int(np.ceil(quads[b, q, :, 0].max() + m)) + 1)
                y0 = max(0, int(np.floor(quads[b, q, :, 1].min() - m)))
                y1 = min(H - 1, int(np.ceil(quads[b, q, :, 1].max() + m)) + 1)
                # window satisfies the exactness predicate
                bx0 = quads[b, q, :, 0].min() - m
                bx1 = quads[b, q, :, 0].max() + m
                assert (ox == 0) if bx0 < 0 else (ox <= bx0)
                assert (ox + T == W) if bx1 > W - _SLACK else (bx1 <= ox + T - _SLACK)
                # every touchable pixel (bilinear lattice incl.) is uploaded
                np.testing.assert_array_equal(
                    frames[b, y0:y1 + 1, x0:x1 + 1], gray[b, y0:y1 + 1, x0:x1 + 1]
                )
        assert seen == int(valid.sum())
        # padding tidx rows point at the trash row (outside the grid)
        from vican_tpu.ops.roi import TILE

        Hp, Wp = tb.frame_hw
        ntiles = B * (Hp // TILE) * (Wp // TILE)
        assert (tb.tidx >= 0).all() and (tb.tidx <= ntiles).all()

    def test_oversized_site_returns_none(self):
        from vican_tpu.ops.roi import build_tile_batch

        quads = np.array([[[[10, 10], [500, 10], [500, 500], [10, 500]]]], np.float32)
        params = DetectorParams(roi_tiers=(64, 128), roi_margin=8)
        out = build_tile_batch(
            np.zeros((1, 720, 1280), np.uint8), quads, np.ones((1, 1), bool),
            np.ones((1, 1), np.float32), 720, 1280, params)
        assert out is None

    def test_blank_batch(self):
        from vican_tpu.ops.roi import build_tile_batch

        params = DetectorParams(roi_tiers=(64, 128), roi_margin=8)
        tb = build_tile_batch(
            np.zeros((2, 96, 96), np.uint8), np.zeros((2, 4, 4, 2), np.float32),
            np.zeros((2, 4), bool), np.zeros((2, 4), np.float32), 96, 96, params)
        assert tb is not None and tb.caps == () and tb.tiles.shape[0] == 0

    def test_crop_meta_matches_scalar_fit(self):
        """Vectorized window fit == the scalar _fit_axis ladder."""
        from vican_tpu.ops.roi import _fit_axis, build_crop_meta

        rng = np.random.default_rng(11)
        H, W = 250, 410
        tiers = (64, 128, 192)
        params = DetectorParams(roi_tiers=tiers, roi_margin=8)
        quads = np.stack([_rand_quads(rng, 12, H, W) for _ in range(2)])
        valid = rng.random((2, 12)) < 0.9
        areas = rng.uniform(50, 300, (2, 12)).astype(np.float32)
        caps, metas = build_crop_meta(quads, valid, areas, H, W, params)
        assert caps is not None
        got = {}
        for cap, meta in zip(caps, metas):
            T, _ = cap
            for i in range(int((meta[8] > 0.5).sum())):
                got[int(meta[10, i])] = (T, int(meta[12, i]), int(meta[13, i]))
        m = 8.0
        for b in range(2):
            for q in np.nonzero(valid[b])[0]:
                for T in tiers:
                    ox = _fit_axis(quads[b, q, :, 0].min() - m,
                                   quads[b, q, :, 0].max() + m, T, W)
                    oy = _fit_axis(quads[b, q, :, 1].min() - m,
                                   quads[b, q, :, 1].max() + m, T, H)
                    if ox is not None and oy is not None:
                        assert got[b * 12 + int(q)] == (T, ox, oy)
                        break
                else:
                    raise AssertionError("scalar ladder found no tier")


class TestExactSamplers:
    def _check(self, view_of, T=64):
        rng = np.random.default_rng(3)
        H, W = 90, 130
        img = rng.integers(0, 256, (H, W)).astype(np.float32)
        ox, oy = 30, 20
        crop = img[oy:oy + T, ox:ox + T]
        # sample points inside the window interior (the clustering contract)
        x = rng.uniform(ox + 1, ox + T - 3, 300).astype(np.float32)
        y = rng.uniform(oy + 1, oy + T - 3, 300).astype(np.float32)
        # BOTH sides jitted (as production runs them): XLA may contract
        # multiply-adds to FMA inside jit, so eager-vs-jit differs by ulps
        # while jit-vs-jit is the bit-equality the pipeline relies on.
        # The view is constructed INSIDE the jit so width/height stay
        # static Python ints (passing a view as a jit argument would turn
        # them into strong-typed arrays and promote the coordinate math to
        # f64 under the suite's x64 mode).
        want = np.asarray(
            jax.jit(lambda im, x, y: _bilinear(im, x, y))(jnp.asarray(img), x, y)
        )
        fn = jax.jit(
            lambda c, o_x, o_y, x, y: _bilinear(view_of(c, o_x, o_y, W, H), x, y)
        )
        got = np.asarray(fn(jnp.asarray(crop), jnp.float32(ox), jnp.float32(oy), x, y))
        np.testing.assert_array_equal(got, want)

    def test_cropview_bit_exact(self):
        self._check(CropView)

    def test_matmul_cropview_bit_exact(self):
        self._check(MatmulCropView)

    def test_matmul_image_bit_exact(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (64, 80)).astype(np.float32)
        x = rng.uniform(-3, 83, 400).astype(np.float32)
        y = rng.uniform(-3, 67, 400).astype(np.float32)
        a = np.asarray(_bilinear(jnp.asarray(img), x, y))
        b = np.asarray(_bilinear(MatmulImage(jnp.asarray(img)), x, y))
        np.testing.assert_array_equal(a, b)

    def test_edge_pinned_window_clamps_like_full_frame(self):
        """Samples beyond the image edge: a window pinned to that edge
        clamps exactly like the full frame does."""
        rng = np.random.default_rng(5)
        H, W = 70, 110
        T = 64
        img = rng.integers(0, 256, (H, W)).astype(np.float32)
        # window pinned to the left/top corner
        view = CropView(jnp.asarray(img[:T, :T]), jnp.float32(0), jnp.float32(0), W, H)
        x = rng.uniform(-5, T - 3, 200).astype(np.float32)  # crosses x < 0
        y = rng.uniform(-5, T - 3, 200).astype(np.float32)
        want = np.asarray(_bilinear(jnp.asarray(img), x, y))
        got = np.asarray(_bilinear(view, x, y))
        np.testing.assert_array_equal(got, want)


class TestFastThresh:
    def test_matches_device_threshold(self):
        from vican_tpu._native import get_fastthresh

        th = get_fastthresh()
        if th is None:
            pytest.skip("no C toolchain")
        rng = np.random.default_rng(6)
        for H, W in [(64, 96), (57, 101), (128, 128)]:
            g = rng.integers(0, 256, (H, W)).astype(np.uint8)
            wins = (3, 9, 13, 19, 23, 29, 33)
            Wb = -(-W // 8)
            packed = np.frombuffer(
                th.threshold_pack(g, H, W, wins, 10.0), np.uint8
            ).reshape(len(wins), H, Wb)
            got = np.unpackbits(packed, axis=-1, bitorder="little")[:, :, :W]
            for wi, w in enumerate(wins):
                want = np.asarray(
                    adaptive_threshold(jnp.asarray(g, jnp.float32), w, 10.0)
                )
                np.testing.assert_array_equal(got[wi].astype(bool), want)
            # padding bits beyond W are zero (the packed CCL reads them)
            if W % 8:
                tail = np.unpackbits(packed, axis=-1, bitorder="little")[:, :, W:]
                assert not tail.any()

"""Pallas TPU kernels (interpret mode on the CPU test mesh)."""
import numpy as np
import jax
import jax.numpy as jnp

from vican_tpu.ops.detect import adaptive_threshold
from vican_tpu.ops.pallas.threshold import multi_threshold

WINS = (3, 9, 13, 19, 23, 29, 33)


def test_multi_threshold_matches_xla():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (96, 256)).astype(np.float32))
    out = np.asarray(multi_threshold(img, WINS, 10.0, interpret=True))
    ref = np.stack([np.asarray(adaptive_threshold(img, w, 10.0)) for w in WINS])
    # identical up to float-sum-order boundary ties
    assert (out == ref.astype(np.float32)).mean() > 0.999


def test_multi_threshold_realistic_scene():
    import pytest

    cv = pytest.importorskip("cv2")
    d = cv.aruco.getPredefinedDictionary(cv.aruco.DICT_4X4_1000)
    img = np.full((144, 256), 170, np.uint8)
    img[30:94, 60:124] = d.generateImageMarker(7, 64)
    out = np.asarray(multi_threshold(jnp.asarray(img, jnp.float32), WINS, 10.0, interpret=True))
    # the marker's black border must be foreground in the larger windows
    assert out[-1, 32:40, 62:70].mean() > 0.9
    # bright background stays background
    assert out[-1, :20, :40].mean() < 0.05


def test_detector_with_pallas_threshold_flag():
    """detect_markers(use_pallas_threshold=True) matches the default path."""
    import pytest

    cv = pytest.importorskip("cv2")
    from vican_tpu.ops import detect
    from vican_tpu.ops.dictionary import marker_bits_table

    d = cv.aruco.getPredefinedDictionary(cv.aruco.DICT_4X4_1000)
    img = np.full((144, 256), 170, np.uint8)
    img[30:94, 60:124] = d.generateImageMarker(7, 64)
    table = jnp.asarray(marker_bits_table("DICT_4X4_1000"))
    gray = detect.preprocess(jnp.asarray(img))

    # interpret=True path isn't reachable through the flag; monkey-level check:
    # run the pallas threshold in interpret mode and feed the rest manually.
    from vican_tpu.ops.pallas.threshold import multi_threshold

    params = detect.DetectorParams()
    fgs = multi_threshold(gray, params.win_sizes, params.thresh_const, interpret=True) > 0.5
    labels = jax.vmap(lambda f: detect.connected_components(f, params.ccl_passes))(fgs)
    cand = jax.vmap(lambda l: detect.extract_quads(l, params))(labels)
    Wn, K = len(params.win_sizes), params.max_candidates
    refined = jax.vmap(lambda q: detect.refine_corners(gray, q, params))(
        cand.corners.reshape(Wn * K, 4, 2)
    )
    ids, rots, corners, ok = detect.decode_quads(
        gray, refined, cand.valid.reshape(Wn * K), table, 4, params
    )
    det = detect.dedup_and_compact(corners, ids, ok, cand.area.reshape(Wn * K), params)
    found = {int(i) for i, okk in zip(det.ids, np.asarray(det.valid)) if okk}
    assert found == {7}

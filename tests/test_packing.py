"""Host packing: C fastpack vs pure-Python parity, and edge cases."""
import numpy as np
import pytest

from vican_tpu._native import get_fastpack
from vican_tpu.solver.packing import pack_problem
from vican_tpu.synthetic import make_problem


@pytest.fixture(scope="module")
def prob():
    return make_problem(seed=21, n_cams=7, n_times=40, n_markers=6)


def test_fastpack_builds():
    assert get_fastpack() is not None, "C extension failed to build"


def test_c_and_python_packers_agree(prob, monkeypatch):
    filt = lambda e: e["reprojected_err"] < 0.03
    nm_r = lambda e: 1.0 + e["corners"][0, 0] * 1e-3
    nm_t = lambda e: 2.0 - e["corners"][0, 1] * 1e-4

    p_c = pack_problem(prob.edges, prob.constraints(), nm_r, nm_t, filt, dtype=np.float32)

    monkeypatch.setenv("VICAN_TPU_NO_NATIVE", "1")
    import vican_tpu._native as native

    monkeypatch.setattr(native, "_cache", {})
    p_py = pack_problem(prob.edges, prob.constraints(), nm_r, nm_t, filt, dtype=np.float32)

    assert p_c.cam_ids == p_py.cam_ids
    assert p_c.time_ids == p_py.time_ids
    assert p_c.num_edges == p_py.num_edges
    np.testing.assert_array_equal(p_c.cam_idx, p_py.cam_idx)
    np.testing.assert_array_equal(p_c.time_idx, p_py.time_idx)
    np.testing.assert_array_equal(p_c.marker_idx, p_py.marker_idx)
    # the C packer converts to quaternions from the raw f64 pose while the
    # Python path stages through f32 matrices first — both reconstruct R_e
    # from f32 quaternions, so they agree to f32 rounding, not exactly
    np.testing.assert_allclose(p_c.R_e, p_py.R_e, atol=1e-6)
    np.testing.assert_allclose(p_c.t_e, p_py.t_e, atol=1e-7)
    np.testing.assert_allclose(p_c.k_r, p_py.k_r, atol=1e-6)
    np.testing.assert_allclose(p_c.k_t, p_py.k_t, atol=1e-6)


def test_missing_marker_constraint_drops_with_warning(prob):
    """The reference KeyErrors on unconstrained markers (bipgo.py:209); we
    drop those edges with a warning instead."""
    constraints = prob.constraints()
    constraints.pop("3")
    with pytest.warns(UserWarning, match="no constraint"):
        p = pack_problem(prob.edges, constraints, lambda e: 1.0, lambda e: 1.0,
                         lambda e: True, dtype=np.float32)
    full = pack_problem(prob.edges, prob.constraints(), lambda e: 1.0, lambda e: 1.0,
                        lambda e: True, dtype=np.float32)
    assert p.num_edges < full.num_edges
    assert "3" not in p.marker_ids


def test_malformed_key_raises(prob):
    edges = dict(prob.edges)
    edges[("0", "nounderscore")] = next(iter(prob.edges.values()))
    with pytest.raises(ValueError):
        pack_problem(edges, prob.constraints(), lambda e: 1.0, lambda e: 1.0,
                     lambda e: True, dtype=np.float32)


def test_filter_exception_propagates(prob):
    def bad_filter(e):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        pack_problem(prob.edges, prob.constraints(), lambda e: 1.0, lambda e: 1.0,
                     bad_filter, dtype=np.float32)

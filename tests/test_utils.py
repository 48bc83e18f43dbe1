"""Registries, phase timing, dictionary tables."""
import numpy as np
import pytest

from vican_tpu.ops.dictionary import get_dictionary, marker_bits_table
from vican_tpu.utils.registry import ARUCO_DICTS, CORNER_REFINE, PNP_FLAGS, resolve
from vican_tpu.utils.timing import PhaseTimer


class TestRegistry:
    def test_known_options_resolve(self):
        assert resolve(ARUCO_DICTS, "DICT_4X4_1000", "aruco") == (4, 1000)
        assert resolve(CORNER_REFINE, "CORNER_REFINE_APRILTAG", "refine") == "apriltag"
        assert resolve(CORNER_REFINE, None, "refine") == "none"
        assert resolve(PNP_FLAGS, "SOLVEPNP_IPPE_SQUARE", "flags") == "ippe_square"

    def test_unknown_option_lists_supported(self):
        with pytest.raises(ValueError, match="DICT_4X4_50"):
            resolve(ARUCO_DICTS, "DICT_NOPE", "aruco dictionary")


class TestDictionaryTables:
    def test_sizes_are_prefixes(self):
        b50, n = get_dictionary("DICT_4X4_50")
        b1000, _ = get_dictionary("DICT_4X4_1000")
        assert n == 4 and b50.shape == (50, 4, 4)
        np.testing.assert_array_equal(b50, b1000[:50])

    def test_rotation_table_consistency(self):
        tab = marker_bits_table("DICT_4X4_1000")
        assert tab.shape == (1000, 4, 16)
        bits, _ = get_dictionary("DICT_4X4_1000")
        # rotation 0 is the canonical pattern
        np.testing.assert_array_equal(tab[:, 0, :], bits.reshape(1000, 16))
        # the four rotations of one marker are distinct for asymmetric ids
        assert len({tab[7, r].tobytes() for r in range(4)}) == 4

    def test_five_by_five(self):
        b, n = get_dictionary("DICT_5X5_100")
        assert n == 5 and b.shape == (100, 5, 5)


class TestPhaseTimer:
    def test_records_events(self, capsys):
        tm = PhaseTimer(verbose=True)
        with tm.phase("Applying constraints"):
            pass
        with tm.phase("Optimizing"):
            pass
        d = tm.as_dict()
        assert set(d) == {"Applying constraints", "Optimizing"}
        assert all(v >= 0 for v in d.values())
        outp = capsys.readouterr().out
        assert "Applying constraints" in outp and "s)." in outp

    def test_quiet_mode(self, capsys):
        tm = PhaseTimer(verbose=False)
        with tm.phase("x"):
            pass
        assert capsys.readouterr().out == ""
        assert len(tm.events) == 1

    def test_sync_on_device_values(self):
        import jax.numpy as jnp

        tm = PhaseTimer(verbose=False)
        with tm.phase("compute") as ev:
            ev["sync"] = jnp.arange(8.0) * 2
        assert tm.events[0]["seconds"] >= 0

"""End-to-end smoke of the L6 driver (examples/tutorial.py — the reference
main.ipynb flow): render -> object calibration -> detection -> camera-network
solve -> cell-9 evaluation -> plot, through the real CLI entry point."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tutorial_quick_synthetic(tmp_path, monkeypatch, capsys):
    sys.path.insert(0, os.path.join(REPO, "examples"))
    import tutorial

    monkeypatch.chdir(tmp_path)  # datasets + calibration.png land here
    monkeypatch.setattr(
        sys, "argv", ["tutorial.py", "--synthetic", "--quick"]
    )
    tutorial.main()
    out = capsys.readouterr().out
    assert "SO(3)" in out and "wrote calibration.png" in out
    # the object stage must recover ALL cube markers on the quick fixture
    # (VERDICT r3 item 7: a shortfall silently drops camera-stage edges)
    assert "object calibration: 24 marker poses" in out, out
    assert "no constraint pose" not in out, out
    assert (tmp_path / "calibration.png").is_file()
    # parse the cell-9 style summary: avg rotation error under a degree and
    # avg translation error under 10 cm on the quick synthetic fixture
    so3_line = next(l for l in out.splitlines() if l.startswith("SO(3)"))
    avg_deg = float(so3_line.split("avg:")[1].split("deg")[0])
    e3_line = next(l for l in out.splitlines() if l.startswith("E(3)"))
    avg_cm = float(e3_line.split("avg:")[1].split("cm")[0])
    assert avg_deg < 1.0, so3_line
    assert avg_cm < 10.0, e3_line

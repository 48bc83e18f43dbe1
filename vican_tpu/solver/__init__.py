"""Pose-graph solver: host packing boundary + jitted device core."""

from .packing import PackedProblem, pack_problem  # noqa: F401

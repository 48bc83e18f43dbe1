"""Host-side utilities: timing/tracing, registries, serialization helpers."""

from .timing import PhaseTimer  # noqa: F401

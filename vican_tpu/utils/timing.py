"""Structured phase timing.

The reference instruments its solver with ad-hoc ``time.time()`` prints around
each phase (reference vican/bipgo.py:201-223, 242-277, 444-481).  We keep the
same printed phase names (so logs stay comparable) but record them as
structured events retrievable programmatically, and synchronize on device
results (``block_until_ready``) so device phases are measured honestly.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any


class PhaseTimer:
    """Collects named phase durations; optionally prints like the reference."""

    def __init__(self, verbose: bool = True):
        self.verbose = verbose
        self.events: list[dict[str, Any]] = []

    @contextmanager
    def phase(self, name: str, sync: Any = None):
        """Time a phase.  ``sync`` may be a pytree of device arrays to block on."""
        if self.verbose:
            print(name, end=" ", flush=True)
        start = time.perf_counter()
        out: dict[str, Any] = {"name": name}
        try:
            yield out
        finally:
            if sync is not None:
                _block(sync)
            if "sync" in out:
                _block(out["sync"])
            dur = time.perf_counter() - start
            out["seconds"] = dur
            self.events.append(out)
            if self.verbose:
                print("({:.3f}s).".format(dur))

    def log(self, msg: str):
        if self.verbose:
            print(msg)

    def as_dict(self) -> dict[str, float]:
        return {e["name"]: e["seconds"] for e in self.events}


def _block(tree):
    import jax

    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, tree
    )

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
    """Collects named phase durations; optionally prints like the reference.

    Set ``trace=True`` (or env ``VICAN_TPU_TRACE=/path``) to also emit
    ``jax.profiler.TraceAnnotation`` ranges so phases show up in a captured
    profiler trace.
    """

    def __init__(self, verbose: bool = True, trace: bool = False):
        import os

        self.verbose = verbose
        self.trace = trace or bool(os.environ.get("VICAN_TPU_TRACE"))
        self.events: list[dict[str, Any]] = []

    @contextmanager
    def phase(self, name: str, sync: Any = None):
        """Time a phase.  ``sync`` may be a pytree of device arrays to block on."""
        if self.verbose:
            print(name, end=" ", flush=True)
        ann = None
        if self.trace:
            import jax.profiler

            ann = jax.profiler.TraceAnnotation(name)
            ann.__enter__()
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
            if ann is not None:
                ann.__exit__(None, None, None)
            if self.verbose:
                print("({:.3f}s).".format(dur))

    def log(self, msg: str):
        if self.verbose:
            print(msg)

    def as_dict(self) -> dict[str, float]:
        return {e["name"]: e["seconds"] for e in self.events}


def _block(tree):
    """Synchronize on a pytree of device arrays — by blocking on ONE leaf.

    On the axon tunnel EVERY ``block_until_ready`` call is a ~25 ms RPC,
    even when the computation already finished (measured: 7 result leaves
    = 175 ms of pure round trips per solve; the r3 history outputs alone
    regressed the headline bench ~10%).  TPU executes dispatches of a
    device in order and a program's outputs complete together, so blocking
    on the LAST leaf of the last-dispatched program covers the whole tree;
    phases here always sync pytrees from a single fused program.
    """
    import jax

    leaves = [
        x for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "block_until_ready")
    ]
    if leaves:
        leaves[-1].block_until_ready()

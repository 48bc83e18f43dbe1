"""Micro-profile of the large-graph solver path on the real device.

Isolates, with forced fetches (CLAUDE.md: under jax 0.9 block_until_ready
waits for device compute but NOT D2H — always force a fetch when timing):
H2D transfer of the chunked arrays, per-primal-dual-iteration cost
(maxiter deltas — maxiter is a traced scalar, so no recompiles), and the
chunk-sort host stage.  Throwaway diagnostics; not part of the bench contract.
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

from vican_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(REPO)

import jax.numpy as jnp  # noqa: E402

from benchmarks.scale_bench import make_folded_edges  # noqa: E402
from vican_tpu.solver.scale import so3_sync_large, sort_edges_by_time  # noqa: E402


def fetch(x):
    return np.asarray(x)


def main():
    C = T = int(os.environ.get("PROF_C", 10_000))
    E = int(os.environ.get("PROF_E", 1_000_000))
    chunk_t = min(T, max(64, -(-T // 8)))
    precision = os.environ.get("PROF_PREC", "high")

    t0 = time.perf_counter()
    KR, k_r, cam_idx, time_idx, _Rc = make_folded_edges(0, C, T, E, kappa=1e4)
    print(f"edge gen: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    chunked = sort_edges_by_time(KR, k_r, cam_idx, time_idx, T, chunk_t)
    print(f"host chunk sort: {time.perf_counter()-t0:.2f}s; "
          f"shapes {[a.shape for a in chunked]}; "
          f"KR_s logical {chunked[0].nbytes/1e6:.0f} MB")

    # H2D alone: transfer + force materialization via tiny fetches
    for rep in range(2):
        t0 = time.perf_counter()
        dev = [jnp.asarray(x) for x in chunked]
        for d in dev:
            fetch(d.ravel()[:1])
        print(f"H2D (rep {rep}): {time.perf_counter()-t0:.2f}s")

    mem = jax.devices()[0].memory_stats()
    if mem:
        print(f"device bytes_in_use after H2D: {mem.get('bytes_in_use', 0)/1e9:.2f} GB")

    def run(maxiter):
        t0 = time.perf_counter()
        res = so3_sync_large(
            *dev, C=C, T=T, chunk_t=chunk_t,
            maxiter=jnp.asarray(maxiter, jnp.int32), precision=precision,
        )
        fetch(res.r_cam)
        fetch(res.evals)
        return time.perf_counter() - t0

    print(f"compile+run(maxiter=4): {run(4):.2f}s")
    mem = jax.devices()[0].memory_stats()
    if mem:
        print(f"device peak_bytes_in_use: {mem.get('peak_bytes_in_use', 0)/1e9:.2f} GB")
    for mi in (1, 2, 4, 4):
        print(f"warm run(maxiter={mi}): {run(mi):.2f}s")


if __name__ == "__main__":
    main()

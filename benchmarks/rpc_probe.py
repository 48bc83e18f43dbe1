"""Measure the per-argument cost of dispatching a jitted program through
the axon tunnel: does each fresh argument (device_put) cost its own
round trip, or do transfers pipeline?

Probes a jitted reduction over (1) one big array + K fresh small scalars,
vs (2) the same payload packed into ONE buffer.  Informs whether packing
the se3sync scalars (maxiter / cert_tol / root_idx / constraints) into
the wire buffer is worth the format churn (solver/core.se3sync_wire).
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vican_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(REPO)

E = 120_000


@jax.jit
def many(w, con, a, b, c):
    return w.sum() + con.sum() + a + b + c


@jax.jit
def one(w):
    return w.sum()


def timed(fn, reps=15):
    ts = []
    for i in range(reps):
        # fresh host values every call (mirrors per-solve behavior)
        w = np.full((E, 8), 1.0 + i, np.float32)
        con = np.full((24, 12), 2.0 + i, np.float32)
        t0 = time.perf_counter()
        if fn is many:
            out = many(jnp.asarray(w), jnp.asarray(con), float(i), i, 1e-6 * i)
        else:
            out = one(jnp.asarray(w))
        np.asarray(out)  # force D2H (block_until_ready excludes D2H)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts


def main():
    print("devices:", jax.devices())
    # warm both programs
    timed(many, reps=2)
    timed(one, reps=2)
    t_many = timed(many)
    t_one = timed(one)
    med = lambda t: t[len(t) // 2]
    print(f"many-args (big + con + 3 scalars): median {med(t_many)*1e3:.1f} ms"
          f"  sorted {[round(t*1e3,1) for t in t_many]}")
    print(f"one-arg  (big only):               median {med(t_one)*1e3:.1f} ms"
          f"  sorted {[round(t*1e3,1) for t in t_one]}")
    print(f"per-extra-arg estimate: "
          f"{(med(t_many)-med(t_one))/4*1e3:.1f} ms")


if __name__ == "__main__":
    main()

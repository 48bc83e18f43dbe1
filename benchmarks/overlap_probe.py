"""Probe the axon tunnel's H2D concurrency properties.

Answers three questions that decide whether restructuring the headline
solve around overlap is worth it (BASELINE.md roofline: the 100-cam wire
H2D is ~0.15-0.2 s of the ~0.4 s solve):

  1. async-put:   does ``jax.device_put`` return before the bytes are on
                  the device (i.e. can host work proceed during a
                  transfer)?
  2. put||compute: does an H2D transfer make progress while a previously
                  dispatched device program is executing?
  3. put||put:    do two concurrent transfers (two host threads) move
                  more bytes/s than one serial transfer of the same total?

Run from the repo root (TPU): ``python benchmarks/overlap_probe.py``.
"""
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vican_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(REPO)

MB = 4  # per-buffer payload (small enough to stay friendly to the tunnel)


def main():
    dev = jax.devices()[0]
    print(f"# backend: {dev.platform}", file=sys.stderr)
    rng = np.random.default_rng(0)
    bufs = [rng.standard_normal((MB * 250_000,), np.float32).astype(np.float32)
            for _ in range(4)]  # MB each

    # ~0.3 s device-resident compute: chained matmuls via fori_loop
    a = jnp.asarray(rng.standard_normal((2048, 2048)).astype(np.float32))
    jax.block_until_ready(a)

    @jax.jit
    def burn(x, n):
        def body(_, y):
            y = y @ y
            return y / jnp.linalg.norm(y)
        return jax.lax.fori_loop(0, n, body, x)

    # calibrate n for ~0.3 s
    n = 8
    while True:
        t0 = time.perf_counter()
        np.asarray(burn(a, n)[:1, :1])
        dt = time.perf_counter() - t0
        if dt > 0.25 or n > 4096:
            break
        n *= 2
    burn_s = dt
    print(f"# burn({n}) = {burn_s:.3f} s", file=sys.stderr)

    def put_block(x):
        d = jax.device_put(x)
        jax.block_until_ready(d)
        return d

    # --- serial baseline: one put+block of 1 buffer
    reps = 5
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        put_block(bufs[i % 4])
        ts.append(time.perf_counter() - t0)
    serial_put = sorted(ts)[reps // 2]

    # --- 1. async-put: device_put return time vs completed-transfer time
    ts_ret = []
    for i in range(reps):
        t0 = time.perf_counter()
        d = jax.device_put(bufs[i % 4])
        ts_ret.append(time.perf_counter() - t0)
        jax.block_until_ready(d)
    put_return = sorted(ts_ret)[reps // 2]

    # --- 2. put || compute: dispatch burn, then put+block; compare with sum
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = burn(a, n)          # async dispatch
        put_block(bufs[i % 4])    # transfer while burning?
        np.asarray(out[:1, :1])   # drain compute
        ts.append(time.perf_counter() - t0)
    both = sorted(ts)[reps // 2]

    # --- 3. put || put: two threads, one buffer each, vs 2 serial puts
    ts = []
    for i in range(reps):
        th = threading.Thread(target=put_block, args=(bufs[(i + 1) % 4],))
        t0 = time.perf_counter()
        th.start()
        put_block(bufs[i % 4])
        th.join()
        ts.append(time.perf_counter() - t0)
    par2 = sorted(ts)[reps // 2]
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        put_block(bufs[i % 4])
        put_block(bufs[(i + 1) % 4])
        ts.append(time.perf_counter() - t0)
    ser2 = sorted(ts)[reps // 2]

    result = {
        "metric": "axon H2D overlap probe",
        "value": round(serial_put, 4),
        "unit": f"s per {MB} MB put+block (median)",
        "details": {
            "payload_MB": MB,
            "serial_put_s": round(serial_put, 4),
            "put_return_s": round(put_return, 4),
            "async_put": bool(put_return < 0.5 * serial_put),
            "burn_s": round(burn_s, 4),
            "burn_then_put_s": round(both, 4),
            "overlap_compute": bool(both < 0.75 * (burn_s + serial_put)),
            "two_puts_serial_s": round(ser2, 4),
            "two_puts_threaded_s": round(par2, 4),
            "overlap_puts": bool(par2 < 0.75 * ser2),
        },
    }
    with open(os.path.join(REPO, "benchmarks", "overlap_probe.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

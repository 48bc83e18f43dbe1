"""Throwaway probe: can a Pallas tiled matvec beat XLA's thin matmul?

XLA's (30000, 30000) bf16 @ (30000, 10) measures ~310 GB/s effective HBM
bandwidth on a v5e — the large-graph solver's filter matvecs are bound by
exactly this.  This probe times a Pallas kernel with explicit (BM, BK)
tiling and f32 accumulation for comparison.

MEASURED CONCLUSION (v5e, this host): with valid divisible tilings the
Pallas kernel exactly matches XLA (236 GB/s at w=128; 8.1 ms both) — the
thin-matmul bandwidth is a machine-level floor, not an XLA scheduling
artifact, so the large-graph solver is at its speed-of-light and a custom
kernel buys nothing.  (Configs whose block sizes do not divide the array
drop the remainder and produce wrong results — only compare relerr<=1e-5
rows.)
"""
import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from vican_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(REPO)


def _kernel(b_ref, x_ref, o_ref, acc_ref, *, k_blocks):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        b_ref[...], x_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(j == k_blocks - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("bm", "bk", "w"))
def pallas_mv(B, X, bm: int, bk: int, w: int):
    M, K = B.shape
    grid = (M // bm, K // bk)
    return pl.pallas_call(
        functools.partial(_kernel, k_blocks=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j: (i, j)),
            pl.BlockSpec((bk, w), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((bm, w), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(B, X)


def main():
    M, K, w = 30208, 31744, 128  # multiples of 512/1024; w = one lane tile
    A = jnp.cos(
        jnp.arange(M, dtype=jnp.float32)[:, None] * 1e-3
        + jnp.arange(K, dtype=jnp.float32)[None, :] * 1e-5
    ).astype(jnp.bfloat16)
    X = jnp.cos(
        jnp.arange(K, dtype=jnp.float32)[:, None]
        + jnp.arange(w, dtype=jnp.float32)[None, :]
    ).astype(jnp.bfloat16)
    nbytes = M * K * 2 / 1e9

    def timeit(f, reps=8):
        # NOTE: operands must be jit ARGUMENTS, not closures — closed-over
        # arrays embed as constants in the HLO and the axon remote-compile
        # service rejects the GB-sized request (HTTP 413)
        o = f(A, X)
        np.asarray(o[0, 0])
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(A, X)
        np.asarray(o[0, 0])
        return (time.perf_counter() - t0) / reps

    xla = jax.jit(lambda a, x: jnp.matmul(a, x, preferred_element_type=jnp.float32))
    t = timeit(xla)
    print(f"XLA  matmul (w={w}): {t*1e3:.1f} ms  ({nbytes/t:.0f} GB/s)", flush=True)
    ref = np.asarray(xla(A, X))

    # only tilings that DIVIDE (M, K) are valid — a non-dividing grid
    # floor-divides away the remainder and reports inflated GB/s
    for bm, bk in [(512, 1024), (256, 1024), (128, 1024)]:
        try:
            f = lambda a, x: pallas_mv(a, x, bm=bm, bk=bk, w=w)
            o = np.asarray(f(A, X))
            err = np.abs(o - ref).max() / max(np.abs(ref).max(), 1e-9)
            t = timeit(f)
            print(f"pallas bm={bm} bk={bk}: {t*1e3:.1f} ms  ({nbytes/t:.0f} GB/s)  relerr {err:.2e}", flush=True)
        except Exception as e:
            print(f"pallas bm={bm} bk={bk}: FAILED {repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()

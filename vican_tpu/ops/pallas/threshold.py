"""Fused multi-window adaptive threshold as a Pallas TPU kernel.

The detector sweeps 7 adaptive-threshold window sizes over every image
(reference cam.py:132-135).  The XLA formulation runs one integral-image
chain per window — 7 full HBM round-trips over the frame.  This kernel
produces all windows in ONE pass: each grid step holds a row strip (plus the
maximum halo) in VMEM and emits every window's binary mask from that single
read, with box sums built incrementally from the smaller windows' sums.

The strip dataflow: the padded image stays in HBM (`pl.ANY`); each grid step
DMAs its (TILE_H + 2*R_MAX, W) window into VMEM scratch — BlockSpec tiling
cannot express overlapping halos, manual async copies can (pallas guide,
"Async DMA").

Numerics match :func:`vican_tpu.ops.detect.adaptive_threshold` (mean-C,
THRESH_BINARY_INV, replicate borders) — tested against it and cv2 in
tests/test_pallas.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["multi_threshold"]

TILE_H = 8


def _kernel(win_sizes, thresh_const, W, r_max, img_hbm, out_ref, scratch, sem):
    i = pl.program_id(0)

    # DMA this strip (+ halo) from HBM into VMEM.
    rows = TILE_H + 2 * r_max
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * TILE_H, rows), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    x = scratch[:]  # (rows, W + 2*r_max) f32
    center = x[r_max : r_max + TILE_H, r_max : r_max + W]

    # Incremental horizontal box sums: each window reuses the previous one's
    # sum and adds only the new ring of columns.
    hs = x[:, r_max : r_max + W]  # radius 0
    prev_r = 0
    for wi, win in enumerate(win_sizes):
        r = win // 2
        for d in range(prev_r + 1, r + 1):
            hs = hs + x[:, r_max - d : r_max - d + W]
            hs = hs + x[:, r_max + d : r_max + d + W]
        prev_r = r

        # vertical box sum over the strip rows for this window
        vs = hs[r_max : r_max + TILE_H, :]
        for d in range(1, r + 1):
            vs = vs + hs[r_max - d : r_max - d + TILE_H, :]
            vs = vs + hs[r_max + d : r_max + d + TILE_H, :]

        mean = vs * (1.0 / (win * win))
        fg = center <= mean - thresh_const
        out_ref[wi, :, :] = fg.astype(jnp.float32)


@partial(jax.jit, static_argnames=("win_sizes", "thresh_const", "interpret"))
def multi_threshold(gray, win_sizes: tuple, thresh_const: float, interpret: bool = False):
    """All-window adaptive threshold of a (H, W) f32 image in one pass.

    Returns (n_win, H, W) float32 masks (1.0 = foreground/dark).  Windows must
    be odd.  H must be a multiple of 8 (pad the image otherwise).
    """
    H, W = gray.shape
    assert H % TILE_H == 0, f"H={H} must be a multiple of {TILE_H}"
    r_max = max(w // 2 for w in win_sizes)

    # replicate-pad once (XLA); width is padded up to a 128 multiple because
    # HBM->VMEM DMA slices must be lane-aligned.
    w_total = -(-(W + 2 * r_max) // 128) * 128
    padded = jnp.pad(gray, ((r_max, r_max), (r_max, w_total - W - r_max)), mode="edge")

    grid = (H // TILE_H,)
    out = pl.pallas_call(
        partial(_kernel, tuple(win_sizes), float(thresh_const), W, r_max),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (len(win_sizes), TILE_H, W),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((len(win_sizes), H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2 * r_max, w_total), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out

"""Single-read Pallas TPU kernel for the CheFSI filter's power-graph matvec.

The dominant cost of :func:`vican_tpu.solver.scale.so3_sync_large` is the
Chebyshev filter loop: ~200+ applications per solve of

    P = B Lambda_T B^T X        (B (3C, 3T) bf16, X (3C, w) thin)

XLA evaluates this as two GEMMs, reading the 1.8 GB bf16 operator TWICE per
application (measured 9.1 ms/pass on a v5e = 48% of HBM peak for the
two-read traffic; the single-read bound is ~2.2 ms and the MXU bound with
the thin operand padded to 128 lanes is ~2.3 ms — see
benchmarks/roofline_result.json).  Reading B once requires the working
panel to stay resident across both products.

Design (second iteration — the first stored the operator as three separate
(Tp, n) planes with PANEL=24, which both tripped Mosaic's 128-lane dynamic
slice alignment on the Lambda diagonals AND wasted ~5x of the MXU on
M=24-row tiles):

- The operator is pre-arranged ONCE per solve into stacked panels

      Bpan[j, a*PANEL + r, :] = B[:, 3*(j*PANEL + r) + a]

  i.e. ``Bpan (n_panels, 3*PANEL, n)`` bf16 in HBM, so each DMA'd panel is
  a single (3*PANEL, n) GEMM operand (M = 96 at PANEL=32: one MXU row-tile
  instead of three) and any panel is Lambda-closed by construction.
- Lambda_T's per-time 3x3 blocks become nine diagonal COLUMNS per panel:

      lamp[j, r, 3*a + b] = Lambda_T[j*PANEL + r, a, b]

  ``lamp (n_panels, PANEL, 128)`` f32 in HBM (lanes 9..127 zero-padding for DMA tile alignment), DMA'd alongside the operator
  panel (1.2 KB — descriptor noise).  In-kernel access is static lane
  slicing only; nothing dynamic touches a tiled dimension.
- The thin operand and result live TRANSPOSED in VMEM — ``xt/yt (w, n)`` —
  because a ``(n, w)`` layout lane-pads w to 128 and balloons to 15 MB at
  n = 30k (the CLAUDE.md minor-dim padding trap); as (w, n) they cost
  0.96 + 1.92 MB.
- Per panel (double-buffered manual DMA, HBM -> VMEM):

      phase 1:  Z (3P, w) = Bpan[j] . xt     (contract over n, f32 accum)
      zb = Z rows [b*P:(b+1)*P]              (static sublane slices)
      wa = sum_b lamp[:, 3a+b, None] * zb    (f32)
      W (3P, w) = concat(wa)  -> bf16
      phase 2:  yt (w, n) += W^T . Bpan[j]   (contract over 3P)

Every operator byte is read exactly once per application; xt, yt stay
VMEM-resident.  At PANEL=32/n=30k: scratch 11.5 MB VMEM, ~470 MXU tiles
per panel -> ~3.1 ms MXU + 2.2 ms DMA overlapped per application.

Numerics match the XLA filter path's contract exactly (scale.py:383-402):
bf16 operands, f32 accumulation (``preferred_element_type``), Lambda
applied in f32, the intermediate re-cast to bf16 before the second GEMM.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PANEL = 32  # time rows per DMA panel; scratch = 2*3*PANEL*n bf16


def _pwr_kernel(lamp_ref, xt_ref, bpan_ref, yt_ref, pan, lpan, psem, lsem):
    """lamp (J, PANEL, 128) f32 HBM; xt (w, n) bf16 VMEM; bpan (J, 3P, n)
    bf16 HBM; yt (w, n) f32 VMEM out; pan (2, 3P, n) bf16 + lpan
    (2, PANEL, 128) f32 scratch; psem/lsem DMA semaphores (2,)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_panels = bpan_ref.shape[0]
    P = lamp_ref.shape[1]

    def dma(slot, j):
        return (
            pltpu.make_async_copy(bpan_ref.at[j], pan.at[slot], psem.at[slot]),
            pltpu.make_async_copy(lamp_ref.at[j], lpan.at[slot], lsem.at[slot]),
        )

    for c in dma(0, 0):
        c.start()
    yt_ref[...] = jnp.zeros_like(yt_ref)

    def body(j, _):
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < n_panels)
        def _():
            for c in dma(nxt, j + 1):
                c.start()

        for c in dma(slot, j):
            c.wait()
        p = pan[slot]  # (3P, n) bf16
        lam = lpan[slot]  # (PANEL, 9) f32
        xt = xt_ref[...]
        # phase 1: Z (3P, w), f32 accumulation, contract over n
        z = jax.lax.dot_general(
            p, xt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        zb = [z[b * P:(b + 1) * P] for b in range(3)]
        w = jnp.concatenate(
            [
                lam[:, 3 * a + 0:3 * a + 1] * zb[0]
                + lam[:, 3 * a + 1:3 * a + 2] * zb[1]
                + lam[:, 3 * a + 2:3 * a + 3] * zb[2]
                for a in range(3)
            ],
            axis=0,
        ).astype(jnp.bfloat16)
        # phase 2: yt (w, n) += W^T . Bpan[j], contract over the panel rows
        yt_ref[...] += jax.lax.dot_general(
            w, p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, n_panels, body, 0)


def pwr_apply(lamp, xt, bpan, *, interpret: bool | None = None):
    """``Y^T (w, n) = (B Lambda_T B^T X)^T`` from the stacked-panel operator.

    ``lamp (J, PANEL, 128) f32``, ``xt (w, n) bf16`` (the TRANSPOSED thin
    operand), ``bpan (J, 3*PANEL, n) bf16`` (zero-padded trailing rows
    carry zero lam).  ``interpret`` defaults to the Pallas interpreter on
    non-TPU backends (CPU parity tests of the integrated filter path) and
    the real Mosaic kernel on TPU.
    """
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform not in ("tpu", "axon")
        except Exception:
            interpret = True
    w, n = xt.shape
    n_pad = bpan.shape[2]
    # Pad the thin dimension to a FIXED 16 sublanes: (a) w=1 probes (the
    # lmax power/Lanczos vectors) trip a Mosaic verifier bug (an M=1 dot
    # lowers to a broadcast-multiply-reduce whose bf16->f32 broadcast fails
    # verification); (b) the f32 result tile is 16 rows physical for any
    # w <= 16 anyway, so w=1 probes and w=10 filter blocks share ONE
    # compiled Mosaic kernel per operator shape — each kernel program
    # costs ~200 s in remote AOT compile on the axon tunnel.
    w_pad = max(16, -(-w // 8) * 8)
    if n != n_pad or w != w_pad:
        # bpan's camera axis is 128-padded (Mosaic slice tiling)
        xt = jnp.pad(xt, ((0, w_pad - w), (0, n_pad - n)))
    return _pwr_apply(lamp, xt, bpan, interpret=interpret)[:w, :n]


@partial(jax.jit, static_argnames=("interpret",))
def _pwr_apply(lamp, xt, bpan, *, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    J, three_p, n = bpan.shape
    P = three_p // 3
    assert lamp.shape == (J, P, 128), (lamp.shape, J, P)
    w = xt.shape[0]
    return pl.pallas_call(
        _pwr_kernel,
        out_shape=jax.ShapeDtypeStruct((w, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # lamp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xt
            pl.BlockSpec(memory_space=pl.ANY),    # bpan stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, three_p, n), jnp.bfloat16),
            pltpu.VMEM((2, P, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # 14.5 MB of declared buffers + Mosaic's own stack pushes past the
        # default 16 MB scoped-vmem limit by ~0.4 MB at n=30k; the v5e has
        # headroom above the default scope
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lamp, xt, bpan)


def panels_from_flat(B, T_pad: int, panel: int = PANEL):
    """(J, 3*panel, n) bf16 stacked panels from the flat (n, 3*T_pad)
    operator: ``Bpan[j, a*panel + r, :] = B[:, 3*(j*panel + r) + a]``;
    trailing time rows zero-padded to a panel multiple."""
    n = B.shape[0]
    n_pad = -(-n // 128) * 128  # Mosaic HBM slices: minor dim tile-aligned
    J = -(-T_pad // panel)
    Tp = J * panel
    # keep n the MINOR dim at every step: a (n, T_pad, 3) intermediate
    # lane-pads the 3 to 128 and materializes 40x the operator (76.8 GB at
    # 10k cams — the CLAUDE.md minor-dim trap, observed as a compile-time
    # HBM OOM in the roofline microbenches)
    Bt = jnp.transpose(B.astype(jnp.bfloat16))  # (3*T_pad, n)
    Bt = jnp.pad(Bt, ((0, 3 * (Tp - T_pad)), (0, n_pad - n)))
    # row q = 3*(j*panel + r) + a  ->  (j, r, a)  ->  (j, a, r)
    return (
        Bt.reshape(J, panel, 3, n_pad)
        .transpose(0, 2, 1, 3)
        .reshape(J, 3 * panel, n_pad)
    )


def lam_panels(lbd_t, n_panels: int, panel: int = PANEL):
    """(J, panel, 128) f32 diagonal columns (lanes 9+: zero pad) from (T_pad, 3, 3) time duals:
    ``lamp[j, r, 3a+b] = lbd_t[j*panel + r, a, b]``."""
    T_pad = lbd_t.shape[0]
    Tp = n_panels * panel
    lam = lbd_t.reshape(T_pad, 9).astype(jnp.float32)
    # lane dim padded 9 -> 128: Mosaic memref slices (the per-panel DMA
    # source) must be tile-aligned in the minor-most dimension
    lam = jnp.pad(lam, ((0, Tp - T_pad), (0, 128 - 9)))
    return lam.reshape(n_panels, panel, 128)


def pallas_pwr_enabled() -> bool:
    """Auto-gate: TPU backend only, overridable via VICAN_TPU_SCALE_PALLAS."""
    import os

    flag = os.environ.get("VICAN_TPU_SCALE_PALLAS", "auto").lower()
    if flag in ("0", "off", "false"):
        return False
    if flag in ("1", "on", "true"):
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False

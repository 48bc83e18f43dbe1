"""Roofline accounting for the flagship scale-solve device programs.

VERDICT r4 item 1: BASELINE.md records wall-clocks only; "fast" must mean
"near the hardware bound", not "beats SciPy".  This bench decomposes the
10k-camera so3_sync_large wall-clock into

  1. H2D of the chunked wire arrays (the axon tunnel is ~23-50 MB/s — the
     recorded 3.23 s includes this, the device envelope does not);
  2. the solve with DEVICE-RESIDENT inputs (the number the envelope bounds);
  3. per-program microbenches of every constituent: bf16 filter matvec,
     f32-HIGHEST matvec, width-1 matvec, raw power product, time products,
     tall-skinny QR, batched 3x3 SVD, operator scatter+cast;

and reports, for each, analytic bytes moved / flops vs measured time →
achieved GB/s and the bound (bandwidth vs MXU).  Finally it prices the full
filter schedule (the exact pass counts so3_sync_large executes for the given
maxiter/degrees) with the MEASURED per-pass times and compares against the
measured resident solve: the residual is what the envelope does not explain.

Methodology per CLAUDE.md: every timing forces a fetch (np.asarray of a tiny
reduction); device pieces run R passes inside one jitted fori_loop so the
~26-40 ms tunnel round trip amortizes to <2 ms/pass.  Peak numbers are TPU
v5e datasheet values (819 GB/s HBM, 197 TFLOP/s bf16; f32-HIGHEST matmuls
execute as 6 bf16 MXU passes).

Writes benchmarks/roofline_result.json and prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

if "JAX_PLATFORMS" in os.environ:
    # honor an explicit platform request (the axon sitecustomize pins
    # jax_platforms=axon regardless; see CLAUDE.md)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from vican_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(REPO)

HBM_PEAK_GBS = 819.0  # TPU v5e datasheet
BF16_PEAK_TFLOPS = 197.0
F32_HIGHEST_PASSES = 6  # f32 HIGHEST matmul = 6 bf16 MXU passes


def _timed(fn, *args, reps=3):
    """Median wall-clock of fn(*args) incl. a forced fetch of its output."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)  # forced fetch = the only real sync on axon
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def run_headline(args):
    """Decompose the headline fused se3sync (bench.py's 100-cam/120k-edge
    problem): host pack, wire build, H2D, fixed dispatch+fetch overhead vs
    per-primal-dual-iteration device compute (isolated by running the SAME
    compiled program at maxiter 0 and 4 — maxiter is a dynamic argument)."""
    import bench  # repo-root: CONFIG + the tutorial-form noise/filter closures

    from vican_tpu.bipgo import pack_wire, pack_wire_v2
    from vican_tpu.solver import core as _core
    from vican_tpu.solver.packing import pack_problem
    from vican_tpu.synthetic import make_problem_arrays

    print(f"# generating headline problem {bench.CONFIG} ...", file=sys.stderr)
    prob = make_problem_arrays(**bench.CONFIG)
    constraints = prob.constraints()

    def pack():
        return pack_problem(
            prob.edges, constraints, bench.NOISE_R, bench.NOISE_T, bench.FILT,
            dtype=np.float32,
        )

    t0 = time.perf_counter()
    packed = pack()
    pack_s = time.perf_counter() - t0
    pack_s = min(pack_s, *(_timed_host(pack) for _ in range(2)))

    use_v2 = os.environ.get("VICAN_TPU_WIRE", "v2") == "v2"
    t0 = time.perf_counter()
    if use_v2:
        wire, con, scales = pack_wire_v2(packed)
    else:
        wire, con = pack_wire(packed)
    wire_build_s = time.perf_counter() - t0
    wire_bytes = wire.nbytes + con.nbytes
    C, T = packed.num_cams, packed.num_times
    d2h_bytes = (C + T + 1) * 12 * 4

    def h2d():
        dev = (jax.device_put(wire), jax.device_put(con))
        jax.block_until_ready(dev)
        return dev[1][:1, :1]

    h2d_s = _timed(h2d, reps=args.reps)
    wire_dev, con_dev = jax.device_put(wire), jax.device_put(con)
    jax.block_until_ready((wire_dev, con_dev))

    kw = dict(root_idx=packed.root_idx, C=C, T=T,
              cert_tol=1e-6 / packed.k_r_scale)

    def chain(mi):
        import jax.numpy as jnp
        with jax.default_matmul_precision("highest"):
            if use_v2:
                _, fused_out = _core.se3sync_wire2(
                    wire_dev, con_dev, jnp.asarray(scales),
                    maxiter=jnp.asarray(mi, jnp.int32), **kw
                )
            else:
                _, fused_out = _core.se3sync_wire(
                    wire_dev, con_dev, maxiter=jnp.asarray(mi, jnp.int32), **kw
                )
        return np.asarray(fused_out)  # the production packed D2H fetch

    print("# compiling fused chain ...", file=sys.stderr)
    t0 = time.perf_counter()
    chain(4)
    compile_s = time.perf_counter() - t0
    t4 = _timed(chain, 4, reps=args.reps)
    t0_s = _timed(chain, 0, reps=args.reps)
    per_iter = max(t4 - t0_s, 0.0) / 4
    result = {
        "metric": "headline fused se3sync decomposition "
                  f"({C} cams, {T} timesteps, {packed.num_edges} edges)",
        "value": round(t4, 4),
        "unit": "s (resident device chain, maxiter=4, incl. dispatch+D2H)",
        "details": {
            "backend": jax.devices()[0].platform,
            "wire": "v2 (24 B/edge)" if use_v2 else "v1 (32 B/edge)",
            "compile_run_s": round(compile_s, 2),
            "host_pack_s": round(pack_s, 4),
            "host_wire_build_s": round(wire_build_s, 4),
            "h2d_s": round(h2d_s, 4),
            "wire_MB": round(wire_bytes / 1e6, 2),
            "h2d_MBs": round(wire_bytes / 1e6 / h2d_s, 1),
            "chain_maxiter4_s": round(t4, 4),
            "chain_maxiter0_s": round(t0_s, 4),
            "per_so3_iter_s": round(per_iter, 4),
            "fixed_overhead_s": round(t0_s, 4),
            "fixed_overhead_note": "dispatch RPC + constraint fold + "
                                   "translation CG + packed D2H "
                                   f"({d2h_bytes/1e3:.0f} KB) at maxiter=0",
            "e2e_sum_s": round(pack_s + wire_build_s + h2d_s + t4, 4),
            "measured_with_forced_fetch": True,
        },
    }
    if not args.no_save:
        with open(os.path.join(REPO, "benchmarks", "roofline_headline.json"), "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


def _timed_host(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def run_perception(args):
    """Decompose the roi-mode crop-detect batch: host decode / C threshold+CCL
    / tile-union build, tile H2D, and the device program on RESIDENT inputs.

    Instruments one serial pipeline pass (PIPELINE_DEPTH=1) by wrapping the
    module-level stage functions, capturing the device program + its argument
    arrays, then re-timing the program alone (the production pipeline
    overlaps the host stages with the device program on two threads, so the
    per-stage sums here bound — not equal — the pipelined wall-clock).
    """
    os.environ["VICAN_TPU_PIPELINE_DEPTH"] = "1"
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    from perception_bench import make_scene

    from vican_tpu import perception as P
    from vican_tpu.dataset import Dataset
    from vican_tpu.ops import roi as RO

    W, H, B = 1280, 720, 16
    root = make_scene(
        os.path.join(REPO, "_synthetic", f"perception_bench_{W}x{H}_48"),
        48, (W, H),
    )  # the full perception_bench scene (3 batches of B)
    ds = Dataset(root)
    files, cams = ds.im_data["filename"], ds.im_data["cam"]

    # per-call times; the FIRST batch carries one-time costs (C kernel
    # load, lazy imports, compiles) and is excluded from the per-image
    # numbers below — steady state is the median of the later batches
    acc = {"decode_s": [], "candidates_s": [], "tile_build_s": []}
    captured = {}
    orig = (P.load_images, P.host_candidates, RO.build_tile_batch,
            P._build_roi_detect)

    def load_timed(fns, grayscale=False):
        t0 = time.perf_counter()
        out = orig[0](fns, grayscale=grayscale)
        acc["decode_s"].append(time.perf_counter() - t0)
        return out

    def cand_timed(gray, params):
        t0 = time.perf_counter()
        out = orig[1](gray, params)
        acc["candidates_s"].append(time.perf_counter() - t0)
        return out

    def tile_timed(*a, **k):
        t0 = time.perf_counter()
        out = orig[2](*a, **k)
        acc["tile_build_s"].append(time.perf_counter() - t0)
        if out is not None:  # None = over-tier site, full-frame fallback
            captured["tb"] = out
        return out

    def build_wrapped(*a, **k):
        run = orig[3](*a, **k)

        def run_captured(*ra):
            captured["run"], captured["args"] = run, ra
            return run(*ra)

        return run_captured

    P.load_images, P.host_candidates = load_timed, cand_timed
    RO.build_tile_batch, P._build_roi_detect = tile_timed, build_wrapped
    try:
        print("# running one roi-mode batch (compile included) ...", file=sys.stderr)
        t0 = time.perf_counter()
        edges = P.estimate_pose_batched(
            files, cams, aruco="DICT_4X4_1000", marker_size=0.48 * 0.575,
            corner_refine="CORNER_REFINE_APRILTAG", brightness=0, contrast=0,
            flags="SOLVEPNP_IPPE_SQUARE", batch_size=B, pipeline_mode="roi",
            verbose=False,
        )
        first_call_s = time.perf_counter() - t0
    finally:
        P.load_images, P.host_candidates = orig[0], orig[1]
        RO.build_tile_batch, P._build_roi_detect = orig[2], orig[3]
    if "run" not in captured:
        raise RuntimeError("roi tile program was not dispatched (mode fell back?)")

    run, ra = captured["run"], captured["args"]
    out_bytes = np.asarray(run(*ra)).nbytes
    dev_s = _timed(lambda: run(*ra), reps=args.reps)

    tb = captured["tb"]
    tile_bytes = tb.tiles.nbytes + tb.tidx.nbytes

    def h2d():
        dev = (jax.device_put(tb.tiles), jax.device_put(tb.tidx))
        jax.block_until_ready(dev)
        return dev[1][:1]

    h2d_s = _timed(h2d, reps=args.reps)

    def steady(key):
        """Median per-image steady-state cost (first batch excluded)."""
        ts = sorted(acc[key][1:]) or acc[key]
        return ts[len(ts) // 2] / B

    result = {
        "metric": f"perception roi batch decomposition ({B} frames {W}x{H})",
        "value": round(dev_s, 4),
        "unit": "s/batch (resident crop-detect program incl. dispatch+D2H)",
        "details": {
            "backend": jax.devices()[0].platform,
            "first_call_s": round(first_call_s, 2),
            "host_decode_s_per_img": round(steady("decode_s"), 4),
            "host_candidates_s_per_img": round(steady("candidates_s"), 4),
            "host_tile_build_s_per_img": round(steady("tile_build_s"), 4),
            "first_batch_candidates_s": round(acc["candidates_s"][0], 3),
            "tile_payload_MB": round(tile_bytes / 1e6, 2),
            "h2d_s": round(h2d_s, 4),
            "h2d_MBs": round(tile_bytes / 1e6 / h2d_s, 1),
            "device_program_s": round(dev_s, 4),
            "result_fetch_KB": round(out_bytes / 1e3, 1),
            "detections": len(edges),
            "note": "production pipeline overlaps host stages with the device "
                    "program on two threads; these are serial per-stage costs",
            "measured_with_forced_fetch": True,
        },
    }
    if not args.no_save:
        with open(os.path.join(REPO, "benchmarks", "roofline_perception.json"), "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--headline", action="store_true",
                    help="decompose the headline fused se3sync instead of "
                         "the 10k-cam scale solve")
    ap.add_argument("--perception", action="store_true",
                    help="decompose the roi-mode crop-detect batch instead")
    ap.add_argument("--cams", type=int, default=10_000)
    ap.add_argument("--times", type=int, default=10_000)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--chunk-t", type=int, default=0)
    ap.add_argument("--maxiter", type=int, default=4)
    ap.add_argument("--cheb-degree", type=int, default=60)
    ap.add_argument("--cheb-rounds", type=int, default=2)
    ap.add_argument("--cheb-degree-warm", type=int, default=28)
    ap.add_argument("--polish-deg", type=int, default=6)
    ap.add_argument("--subspace", type=int, default=10)
    ap.add_argument("--loop-reps", type=int, default=40,
                    help="matvec passes per jitted fori_loop (amortizes RPC)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-save", action="store_true")
    args = ap.parse_args()

    if args.headline:
        run_headline(args)
        return
    if args.perception:
        run_perception(args)
        return

    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    from scale_bench import make_folded_edges

    from vican_tpu.solver.scale import (
        _blockdiag_mv, _make_operator, sort_edges_by_time_wire, so3_sync_large,
    )
    from vican_tpu.solver.core import HIGHEST
    from vican_tpu.ops.lie import svd3_so3

    C, T, E = args.cams, args.times, args.edges
    chunk_t = args.chunk_t or min(T, max(64, -(-T // 8)))
    n = 3 * C
    m = args.subspace
    R = args.loop_reps

    print(f"# generating {C} cams / {T} timesteps / {E} edges ...", file=sys.stderr)
    KR, k_r, cam_idx, time_idx, _ = make_folded_edges(0, C, T, E, kappa=1e4)
    chunked = sort_edges_by_time_wire(KR, k_r, cam_idx, time_idx, T, chunk_t)
    wire_bytes = sum(np.asarray(x).nbytes for x in chunked)
    n_chunks = chunked[1].shape[0]
    T_pad = n_chunks * chunk_t

    ops = {}

    # ---- 1. H2D: the wire arrays across the tunnel --------------------
    def h2d():
        dev = [jax.device_put(np.asarray(x)) for x in chunked]
        jax.block_until_ready(dev)
        return dev[1][:1, :1]  # tiny fetch to close the chain

    h2d_s = _timed(h2d, reps=args.reps)
    ops["h2d_wire"] = {
        "ms": h2d_s * 1e3, "bytes": wire_bytes,
        "note": "chunked int16-quat wire + weights + indices across the axon tunnel",
    }
    dev = [jax.device_put(np.asarray(x)) for x in chunked]
    jax.block_until_ready(dev)

    # ---- 2. the solve with device-resident inputs ----------------------
    def solve_resident():
        res = so3_sync_large(
            *dev, C=C, T=T, chunk_t=chunk_t,
            maxiter=jnp.asarray(args.maxiter, jnp.int32),
            cheb_degree=args.cheb_degree, cheb_rounds=args.cheb_rounds,
            cheb_degree_warm=args.cheb_degree_warm, polish_deg=args.polish_deg,
            subspace=m,
        )
        return res.r_cam

    print("# compiling solve ...", file=sys.stderr)
    t0 = time.perf_counter()
    np.asarray(solve_resident())
    compile_s = time.perf_counter() - t0
    solve_s = _timed(solve_resident, reps=args.reps)

    # ---- 3. constituent programs ---------------------------------------
    # Rebuild the exact operator closures the solver uses (quat-wire decode
    # + scatter happen inside; loop-invariant under the fori_loops below).
    B_f32_bytes = n * 3 * T_pad * 4
    B_bf16_bytes = n * 3 * T_pad * 2

    lbd_t = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (T_pad, 3, 3))
    lbd_c = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (C, 3, 3))

    def _loop(mv_builder, X0, reps):
        """Run `reps` dependent matvec passes inside one jit; returns a tiny
        reduction so nothing is DCE'd and only one fetch crosses the tunnel."""

        @jax.jit
        def prog(KR_s, k_s, cam_s, tloc_s, X):
            prepare, time_products = _make_operator(
                KR_s, k_s, cam_s, tloc_s, C=C, chunk_t=chunk_t,
                prec=HIGHEST, f_dtype=jnp.bfloat16,
            )
            mv = mv_builder(prepare, time_products)

            def body(_, X):
                Y = mv(X)
                # keep the iterate bounded without a (serializing) norm
                return Y * (1.0 / jnp.maximum(jnp.max(jnp.abs(Y)), 1e-30))

            X = lax.fori_loop(0, reps, body, X)
            return jnp.sum(X[:4, :])

        return prog

    X10 = jnp.asarray(np.random.default_rng(0).normal(size=(n, m)), jnp.float32)
    X1 = X10[:, :1]
    X3 = X10[:, :3]

    from vican_tpu.solver.pallas_pwr import pallas_pwr_enabled
    # the Pallas kernel reads the bf16 operator ONCE per filter pass; the
    # XLA two-GEMM path reads it twice
    filt_reads = 1 if pallas_pwr_enabled() else 2

    cases = {
        # Chebyshev filter pass: Lambda_C blockdiag - B_filt Lambda_T B_filt^T,
        # the dominant loop (bf16 operand, 2 B reads)
        "filt_pass_w10": (
            lambda prep, tp: prep(lbd_c, lbd_t, 1.0)[1], X10,
            filt_reads * B_bf16_bytes, 2 * 2 * n * 3 * T_pad * 128, 1,
        ),
        # full-precision pass (polish + Rayleigh-Ritz): f32 HIGHEST
        "full_pass_w10": (
            lambda prep, tp: prep(lbd_c, lbd_t, 1.0)[0], X10,
            2 * B_f32_bytes, 2 * 2 * n * 3 * T_pad * 128, F32_HIGHEST_PASSES,
        ),
        # width-1 filter matvec (Lanczos / power refinement)
        "filt_pass_w1": (
            lambda prep, tp: prep(lbd_c, lbd_t, 1.0)[1], X1,
            filt_reads * B_bf16_bytes, 2 * 2 * n * 3 * T_pad * 128, 1,
        ),
        # polish pass: f32 operand at 3-pass HIGH precision
        "polish_pass_w10": (
            lambda prep, tp: prep(lbd_c, lbd_t, 1.0)[2], X10,
            2 * B_f32_bytes, 2 * 2 * n * 3 * T_pad * 128, 3,
        ),
        # raw power product at width 3 (camera dual update)
        "pwr_w3": (
            lambda prep, tp: prep(lbd_c, lbd_t, 1.0)[3], X3,
            2 * B_f32_bytes, 2 * 2 * n * 3 * T_pad * 128, F32_HIGHEST_PASSES,
        ),
    }
    for name, (builder, X0, nbytes, flops, passes) in cases.items():
        prog = _loop(builder, X0, R)
        print(f"# compiling {name} ...", file=sys.stderr)
        np.asarray(prog(*dev, X0))  # compile
        t = _timed(prog, *dev, X0, reps=args.reps) / R
        ops[name] = {"ms": t * 1e3, "bytes": nbytes, "bf16_flops": flops * passes}

    # time products: rt[t] = B^T r  (one f32 read of B, width 3)
    @jax.jit
    def tp_prog(KR_s, k_s, cam_s, tloc_s, r):
        _, time_products = _make_operator(
            KR_s, k_s, cam_s, tloc_s, C=C, chunk_t=chunk_t,
            prec=HIGHEST, f_dtype=jnp.bfloat16,
        )

        def body(_, r):
            rt = time_products(r)
            return r * (1.0 / jnp.maximum(jnp.max(jnp.abs(rt)), 1e-30))

        r = lax.fori_loop(0, R, body, r)
        return jnp.sum(r[:4])

    r3 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (C, 3, 3)).reshape(n, 3)
    print("# compiling time_products ...", file=sys.stderr)
    np.asarray(tp_prog(*dev, r3))
    t = _timed(tp_prog, *dev, r3, reps=args.reps) / R
    ops["time_products"] = {
        "ms": t * 1e3, "bytes": B_f32_bytes,
        "bf16_flops": 2 * n * 3 * T_pad * 128 * F32_HIGHEST_PASSES,
    }

    # tall-skinny QR (subspace re-orthonormalization)
    @jax.jit
    def qr_prog(X):
        def body(_, X):
            Q, _ = jnp.linalg.qr(X)
            return Q + 1e-6
        return jnp.sum(lax.fori_loop(0, 8, body, X)[:4, :])

    np.asarray(qr_prog(X10))
    ops[f"qr_{n}x{m}"] = {"ms": _timed(qr_prog, X10, reps=args.reps) / 8 * 1e3,
                          "bytes": 2 * n * m * 4}

    # batched 3x3 SVD (dual updates: C camera + T time blocks per iteration)
    blocks = jnp.asarray(
        np.random.default_rng(1).normal(size=(C, 3, 3)), jnp.float32)

    @jax.jit
    def svd_prog(M):
        def body(_, M):
            r, u, s, v = svd3_so3(M)
            return M + 1e-6 * r
        return jnp.sum(lax.fori_loop(0, 8, body, M)[:4])

    np.asarray(svd_prog(blocks))
    ops[f"svd3_{C}"] = {"ms": _timed(svd_prog, blocks, reps=args.reps) / 8 * 1e3,
                       "bytes": 2 * C * 9 * 4}

    # operator build: quat decode + scatter into (3C, 3T_pad) + bf16 cast
    @jax.jit
    def build_prog(KR_s, k_s, cam_s, tloc_s):
        prepare, _ = _make_operator(
            KR_s, k_s, cam_s, tloc_s, C=C, chunk_t=chunk_t,
            prec=HIGHEST, f_dtype=jnp.bfloat16,
        )
        mv_full, mv_filt, _, _ = prepare(lbd_c, lbd_t, 1.0)
        # touch both operators once so the scatter + cast must materialize
        return jnp.sum(mv_full(X1)[:4]) + jnp.sum(mv_filt(X1)[:4])

    np.asarray(build_prog(*dev))
    ops["operator_build+2mv"] = {
        "ms": _timed(build_prog, *dev, reps=args.reps) * 1e3,
        "bytes": 2 * B_f32_bytes + 2 * B_bf16_bytes + B_f32_bytes + B_bf16_bytes,
        "note": "scatter-write f32 + cast read/write bf16 + 1 full & 1 filt mv",
    }

    # ---- derived columns ------------------------------------------------
    for name, d in ops.items():
        ms = d["ms"]
        d["achieved_GBs"] = round(d["bytes"] / 1e9 / (ms / 1e3), 1)
        d["pct_hbm_peak"] = round(100 * d["achieved_GBs"] / HBM_PEAK_GBS, 1)
        if "bf16_flops" in d:
            d["mxu_bound_ms"] = round(d["bf16_flops"] / (BF16_PEAK_TFLOPS * 1e9), 3)
            d["bw_bound_ms"] = round(d["bytes"] / 1e9 / HBM_PEAK_GBS * 1e3, 3)
            d["bound"] = "mxu" if d["mxu_bound_ms"] > d["bw_bound_ms"] else "hbm"
        d["ms"] = round(ms, 3)

    # ---- price the schedule ---------------------------------------------
    # pass counts so3_sync_large executes (see _sync_body_fns):
    it0, warm = 1, args.maxiter - 1
    counts = {
        "filt_pass_w10": it0 * args.cheb_rounds * args.cheb_degree
        + warm * 1 * args.cheb_degree_warm,
        "filt_pass_w1": it0 * 12 + warm * 5,  # Lanczos k=12; refine 4 + RQ
        "full_pass_w10": it0 * (args.cheb_rounds + 1) + warm * (1 + 1),
        "polish_pass_w10": (it0 + warm) * args.polish_deg,
        "pwr_w3": args.maxiter,
        "time_products": args.maxiter,
        f"qr_{n}x{m}": it0 * (args.cheb_rounds + 1) + warm * 2,
        f"svd3_{C}": 2 * args.maxiter,  # camera + time dual SVDs (count uses C; T_pad blocks are same order)
    }
    predicted_ms = sum(counts[k] * ops[k]["ms"] for k in counts)
    predicted_ms += ops["operator_build+2mv"]["ms"]  # scatter+cast ~ once
    schedule = {
        k: {"n": counts[k], "ms_total": round(counts[k] * ops[k]["ms"], 1)}
        for k in counts
    }

    result = {
        "metric": f"so3_sync_large roofline ({C} cams, {T} timesteps, {E} edges)",
        "value": round(solve_s, 3),
        "unit": "s (device-resident solve)",
        "details": {
            "backend": jax.devices()[0].platform,
            "compile_run_s": round(compile_s, 2),
            "solve_resident_s": round(solve_s, 3),
            "h2d_wire_s": round(h2d_s, 3),
            "wire_MB": round(wire_bytes / 1e6, 1),
            "predicted_from_pieces_s": round(predicted_ms / 1e3, 3),
            "unaccounted_s": round(solve_s - predicted_ms / 1e3, 3),
            "hbm_peak_GBs": HBM_PEAK_GBS,
            "bf16_peak_TFLOPs": BF16_PEAK_TFLOPS,
            "ops": ops,
            "schedule": schedule,
            "measured_with_forced_fetch": True,
        },
    }
    if not args.no_save:
        with open(os.path.join(REPO, "benchmarks", "roofline_result.json"), "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Headline benchmark: large_shop-scale bipartite SE(3) sync.

Workload: synthetic camera-network calibration at the reference's large_shop
scale (hundreds of cameras, 10k timesteps, ~1.2e5 edges — README.md:20),
solved end-to-end through the public dict API (host packing included, like
the reference pays for its Python dict loops).

Baseline: the actual reference implementation (NumPy/SciPy, imported
read-only from /root/reference) on the *same* edge dict, measured IN THE
SAME SESSION interleaved with our runs (host CPU speed drifts 2-3x
minute-to-minute on this machine, so a cached cross-session baseline is
unfair in both directions).  benchmarks/baseline_cache.json keeps the
last-known baseline only for hosts where the reference is absent.

Prints ONE JSON line:
  {"metric": ..., "value": <our wall-clock seconds>, "unit": "s",
   "vs_baseline": <baseline_seconds / our_seconds>}
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

sys.path.insert(0, REPO)

# Persistent XLA compilation cache: the fused solver program compiles in
# minutes through the remote-compile tunnel; cache it across bench runs.
import jax  # noqa: E402

from vican_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(REPO)
CACHE_PATH = os.path.join(REPO, "benchmarks", "baseline_cache.json")
REFERENCE = "/root/reference"

CONFIG = dict(seed=0, n_cams=100, n_times=10_000, n_markers=24, n_edges=120_000,
              kappa_r=1e4, sigma_t=1e-3)
CONFIG_KEY = "large_shop_synth:v2-median3:" + ",".join(
    f"{k}={v}" for k, v in sorted(CONFIG.items())
)

NOISE_R = lambda e: 1.0
NOISE_T = lambda e: 1.0
FILT = lambda e: e["reprojected_err"] < 0.05
MAXITER = 4


def make_ours_runner(prob):
    from vican_tpu import bipgo

    def once():
        t0 = time.perf_counter()
        out = bipgo.bipartite_se3sync(
            prob.edges, constraints=prob.constraints(),
            noise_model_r=NOISE_R, noise_model_t=NOISE_T, edge_filter=FILT,
            maxiter=MAXITER, lsqr_solver="conjugate_gradient",
            dtype=np.float32, verbose=False,
        )
        return time.perf_counter() - t0, out

    return once


def make_reference_runner(prob):
    """Per-run closure for the actual reference solver (NumPy/SciPy).

    Returns None if the reference checkout is absent.  The edge-dict
    conversion to the reference's SE3 type happens once, outside timing."""
    if not os.path.isdir(os.path.join(REFERENCE, "vican")):
        return None
    sys.path.insert(0, REFERENCE)
    import vican.bipgo as ref_bipgo
    from vican.geometry import SE3 as RefSE3

    edges = {}
    for k, v in prob.edges.items():
        edges[k] = {
            "pose": RefSE3(R=np.asarray(v["pose"].R(), np.float64),
                           t=np.asarray(v["pose"].t(), np.float64)),
            "corners": v["corners"],
            "reprojected_err": v["reprojected_err"],
            "im_filename": v["im_filename"],
        }
    constraints = {
        m: RefSE3(R=np.asarray(c.R(), np.float64), t=np.asarray(c.t(), np.float64))
        for m, c in prob.constraints().items()
    }
    import contextlib, io

    def once():
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()), contextlib.redirect_stderr(io.StringIO()):
            ref_bipgo.bipartite_se3sync(
                edges, constraints=constraints,
                noise_model_r=NOISE_R, noise_model_t=NOISE_T, edge_filter=FILT,
                maxiter=MAXITER, lsqr_solver="conjugate_gradient", dtype=np.float32,
            )
        return time.perf_counter() - t0

    return once


def accuracy(prob, pose_est):
    from vican_tpu.geometry import distance_SO3, optimize_gauge_SE3

    valid = [c for c in prob.cams_gt if c in pose_est]
    G = optimize_gauge_SE3([prob.cams_gt[c].inv() for c in valid],
                           [pose_est[c].inv() for c in valid])
    r = [distance_SO3(np.asarray(prob.cams_gt[c].R(), np.float64),
                      np.asarray((G.inv() @ pose_est[c]).R(), np.float64)) for c in valid]
    t = [np.linalg.norm(prob.cams_gt[c].t() - (G.inv() @ pose_est[c]).t()) for c in valid]
    return float(np.mean(r)), float(np.mean(t))


def _wait_for_backend(max_wait_s: float = 5400.0) -> None:
    """Block until the accelerator backend initializes.

    Killing a process mid-compile can wedge the axon tunnel for ~30 min
    (even ``jax.devices()`` hangs or raises Unavailable; see CLAUDE.md) —
    a transient condition that must not turn the round's bench artifact
    into a crash.  Probe with exponential backoff, bounded."""
    import subprocess

    deadline = time.monotonic() + max_wait_s
    first = True
    while True:
        # Probe in a SUBPROCESS: a wedged tunnel HANGS backend init rather
        # than raising, and a hung in-process attempt pins the jax init
        # lock forever — even after the tunnel recovers.  A fresh process
        # per probe keeps this process's jax state untouched until the
        # backend is known healthy.
        try:
            res = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=120,
            )
            if res.returncode == 0:
                return
            err = (res.stderr or b"").decode(errors="replace").strip()
            why = err[-120:]
            # only the wedged-tunnel signatures are transient; a missing
            # platform / import error / bad config never heals — fail fast
            if not any(s in err for s in
                       ("UNAVAILABLE", "Unavailable", "DEADLINE")):
                raise RuntimeError(f"backend probe failed (non-transient): "
                                   f"{why}")
        except subprocess.TimeoutExpired:
            why = "hang"
        if first:
            print(f"# backend unavailable ({why}); retrying until healthy",
                  file=sys.stderr)
            first = False
        if time.monotonic() > deadline:
            raise RuntimeError("accelerator backend unavailable after "
                               f"{max_wait_s:.0f}s of retries: {why}")
        # a hung probe gets SIGKILLed by the timeout, which the tunnel can
        # count as ANOTHER mid-setup kill that REFRESHES the ~30-min wedge
        # (observed: a 30-min wedge stretched past 2 h under ~25-min
        # probing) — the hang backoff must EXCEED the wedge window so the
        # next probe lands after expiry
        time.sleep(1800.0 if why == "hang" else 30.0)


def main():
    from vican_tpu.synthetic import make_problem_arrays

    try:
        _wait_for_backend()
    except RuntimeError as e:
        # the driver contract is ONE JSON line — emit an honest degraded
        # artifact instead of a stack trace when the tunnel never recovers
        print(json.dumps({
            "metric": "large_shop_synth se3sync wall-clock "
                      "(100 cams, 10k timesteps, 120k edges)",
            "value": None,
            "unit": "s",
            "vs_baseline": None,
            "details": {"error": f"accelerator backend unavailable: {e}"},
        }))
        return
    prob = make_problem_arrays(**CONFIG)

    ours_once = make_ours_runner(prob)
    warm_s, ours_out = ours_once()  # compile + cache shapes
    r_err, t_err = accuracy(prob, ours_out)

    # INTERLEAVE reference and our runs in the SAME session: host CPU speed
    # drifts minute-to-minute on this machine (2-3x observed; see CLAUDE.md
    # and the perception bench's round-robin reps) and the tunnel adds its
    # own jitter, so a baseline cached from another session is not a fair
    # denominator in either direction.  3 reference runs ride between our
    # 7 runs; median of each.
    ref_once = None
    try:
        ref_once = make_reference_runner(prob)
    except Exception as e:  # baseline failure must not kill the bench
        print(f"# baseline setup failed: {e!r}", file=sys.stderr)
    our_times, ref_times = [], []
    for k in range(3):
        if ref_once is not None:
            try:
                ref_times.append(ref_once())
            except Exception as e:
                print(f"# baseline run failed: {e!r}", file=sys.stderr)
                ref_once = None
        for _ in range(2):
            t, ours_out = ours_once()
            our_times.append(t)
    t, ours_out = ours_once()
    our_times.append(t)
    our_times.sort()
    ref_times.sort()
    ours_s = our_times[len(our_times) // 2]

    cache = {}
    if os.path.isfile(CACHE_PATH):
        with open(CACHE_PATH) as f:
            cache = json.load(f)
    baseline_cached = cache.get(CONFIG_KEY)
    if ref_times:
        baseline_s = ref_times[len(ref_times) // 2]
        # Cache the MIN across sessions, not the last session: host CPU
        # speed drifts 2-3x between sessions, and a slow-session baseline
        # would inflate vs_baseline on reference-less hosts (ADVICE r4).
        cache[CONFIG_KEY] = min(baseline_s, baseline_cached or baseline_s)
        os.makedirs(os.path.dirname(CACHE_PATH), exist_ok=True)
        with open(CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1)
    else:
        baseline_s = baseline_cached

    vs = (baseline_s / ours_s) if baseline_s else None
    details = {
        "first_call_s": round(warm_s, 2),
        "runs_s_sorted": [round(t, 3) for t in our_times],  # value = median
        "baseline_scipy_s": round(baseline_s, 2) if baseline_s else None,
        "baseline_runs_s_sorted": [round(t, 2) for t in ref_times] or None,
        "baseline_same_session": bool(ref_times),
        "rot_err_deg_mean": round(r_err, 5),
        "trans_err_m_mean": round(t_err, 6),
    }
    # 10k-camera chunked-path wall-clock, recorded by benchmarks/scale_bench.py
    # (too slow to re-run inside the driver bench; the stored result carries
    # its own config + forced-fetch methodology).
    scale_path = os.path.join(REPO, "benchmarks", "scale_result.json")
    if os.path.isfile(scale_path):
        with open(scale_path) as f:
            sr = json.load(f)
        details["scale_10kcam_warm_s_recorded"] = sr["value"]
    # Perception throughput: REFRESH the artifact in THIS session (VERDICT
    # r4 item 3 — the repo's headline numbers must be the driver session's,
    # not a best-of-N-sessions hand run).  roi + the measured reference
    # pipeline, interleaved reps inside perception_bench.  Fail-soft: a
    # perception failure must not take down the solver bench artifact.
    perc_refreshed = False
    if os.environ.get("VICAN_TPU_BENCH_PERCEPTION", "1") != "0":
        import subprocess
        try:
            r = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "benchmarks", "perception_bench.py"),
                 "--modes", "roi,reference", "--reps", "3"],
                capture_output=True, timeout=3600,
            )
            perc_refreshed = r.returncode == 0
            if not perc_refreshed:
                tail = (r.stderr or b"").decode(errors="replace")[-200:]
                print(f"# perception refresh failed: {tail}", file=sys.stderr)
        except Exception as e:
            print(f"# perception refresh failed: {e!r}", file=sys.stderr)
    # Perception throughput, recorded by benchmarks/perception_bench.py
    # (includes the MEASURED reference-cv2 pipeline on the same scene/host).
    perc_path = os.path.join(REPO, "benchmarks", "perception_result.json")
    if os.path.isfile(perc_path):
        with open(perc_path) as f:
            pr = json.load(f)
        details["perception_img_per_s_recorded"] = {
            m: v.get("img_per_s") for m, v in pr.get("modes", {}).items()
        }
        details["perception_refreshed_this_session"] = perc_refreshed
    print(json.dumps({
        "metric": "large_shop_synth se3sync wall-clock (100 cams, 10k timesteps, 120k edges)",
        "value": round(ours_s, 4),
        "unit": "s",
        "vs_baseline": round(vs, 2) if vs else None,
        "details": details,
    }))


if __name__ == "__main__":
    main()

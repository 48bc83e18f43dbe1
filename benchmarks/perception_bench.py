"""Perception throughput benchmark: images -> edge dict (img/s per mode).

Renders a reusable synthetic cube scene (same generator as the tutorial),
then times ``estimate_pose_batched`` in each pipeline mode with a forced
fetch at the end (CLAUDE.md measurement rules).  Prints one JSON line per
mode; optionally writes ``benchmarks/perception_result.json``.

The device mode's packed-mask D2H (~W*H/8 bytes per window per image) is
the dominant cost on a remote-tunnel host (~25 MB/s); on a PCIe host the
same transfers are ~1 ms.  See BASELINE.md.
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

from vican_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(REPO)


def make_scene(root, n_frames, res):
    from vican_tpu.synthetic import render_cube_scene

    render_cube_scene(root, [(2.2, 0.3, 1.2)], n_frames, seed=4, res=res)
    return root


def _install_legacy_aruco_shims():
    """Make the reference's OpenCV 4.x aruco calls work on OpenCV >= 4.7/5.

    The reference (vican/cam.py:127-147) uses ``Dictionary_get``,
    ``DetectorParameters_create`` and the free-function ``detectMarkers`` —
    all removed in the new aruco API.  These shims map them onto the new
    API 1:1 (same parameters object, same return convention) so the
    reference's own ``estimate_pose_mp`` runs verbatim; ``mp.Pool`` workers
    inherit the patched module state via fork.
    """
    import cv2 as cv

    if hasattr(cv.aruco, "Dictionary_get"):
        return  # genuine old API present
    cv.aruco.Dictionary_get = cv.aruco.getPredefinedDictionary
    cv.aruco.DetectorParameters_create = cv.aruco.DetectorParameters

    def detect_markers(im, dictionary, parameters=None):
        det = cv.aruco.ArucoDetector(dictionary, parameters)
        return det.detectMarkers(im)

    cv.aruco.detectMarkers = detect_markers


def run_reference(files, ref_cams, marker_ids):
    """Run the actual reference pipeline (/root/reference) on the scene."""
    sys.path.insert(0, "/root/reference")
    _install_legacy_aruco_shims()
    from vican.cam import estimate_pose_mp  # noqa: E402  (the reference's)

    return estimate_pose_mp(
        files, ref_cams, aruco="DICT_4X4_1000", marker_size=0.48 * 0.575,
        corner_refine="CORNER_REFINE_APRILTAG", brightness=0, contrast=0,
        flags="SOLVEPNP_IPPE_SQUARE", marker_ids=marker_ids,
    )


def to_reference_cams(cams):
    """Convert our Camera records to reference vican.cam.Camera objects."""
    from vican.cam import Camera as RefCamera  # after sys.path insert
    from vican.geometry import SE3 as RefSE3

    out = []
    for c in cams:
        ext = c.extrinsics
        out.append(RefCamera(
            id=c.id,
            intrinsics=np.asarray(c.intrinsics, np.float64),
            distortion=np.asarray(c.distortion, np.float64),
            extrinsics=RefSE3(R=ext.R(), t=ext.t()) if ext is not None else None,
            resolution_x=c.resolution_x, resolution_y=c.resolution_y,
        ))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--res", default="1280x720")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--modes", default="device,host,pure")
    ap.add_argument("--reps", type=int, default=3)  # odd: times[n//2] is a true median
    ap.add_argument("--no-save", action="store_true")
    args = ap.parse_args()
    W, H = map(int, args.res.split("x"))

    from vican_tpu.dataset import Dataset
    from vican_tpu.perception import estimate_pose_batched

    root = make_scene(
        os.path.join(REPO, "_synthetic", f"perception_bench_{W}x{H}_{args.frames}"),
        args.frames, (W, H),
    )
    ds = Dataset(root)
    files = ds.im_data["filename"]
    cams = ds.im_data["cam"]

    def make_runner(mode):
        if mode == "reference":
            sys.path.insert(0, "/root/reference")
            ref_cams = to_reference_cams(cams)
            marker_ids = [str(i) for i in range(24)]

            def run():
                t0 = time.perf_counter()
                edges = run_reference(files, ref_cams, marker_ids)
                return time.perf_counter() - t0, len(edges), set(edges)
        else:
            def run(mode=mode):
                # same marker_ids filter as the reference run (the tutorial's
                # MARKER_IDS — stray dictionary matches on junk quads exist
                # in BOTH pipelines and are filtered in real use)
                wanted = {str(i) for i in range(24)}
                t0 = time.perf_counter()
                edges = estimate_pose_batched(
                    files, cams, aruco="DICT_4X4_1000", marker_size=0.48 * 0.575,
                    corner_refine="CORNER_REFINE_APRILTAG", brightness=0,
                    contrast=0, flags="SOLVEPNP_IPPE_SQUARE",
                    batch_size=args.batch_size, pipeline_mode=mode, verbose=False,
                )
                edges = {k: v for k, v in edges.items()
                         if k[-1].split("_")[-1] in wanted}
                # the edge dict is already host-side numpy: construction IS the sync
                return time.perf_counter() - t0, len(edges), set(edges)

        return run

    # INTERLEAVED reps: host CPU speed drifts minute-to-minute on this
    # machine (identical-file imread measured 4.8 vs 12.9 ms/img in two
    # sessions), so mode A's reps and mode B's reps must sample the same
    # machine state — round-robin the modes inside each rep.
    results = {}
    keys_of: dict = {}
    runners = {}
    times_of: dict = {}
    for mode in args.modes.split(","):
        runners[mode] = make_runner(mode)
        try:
            _warm, n_det, keys_of[mode] = runners[mode]()  # warmup/compile
            results[mode] = {"detections": n_det, "first_call_s": round(_warm, 1)}
            times_of[mode] = []
        except Exception as e:  # a mode unavailable on this host
            results[mode] = {"error": repr(e)[:200]}
            runners.pop(mode)
    for _rep in range(args.reps):
        for mode in runners:
            times_of[mode].append(runners[mode]()[0])
    for mode in runners:
        times = sorted(times_of[mode])
        sec = times[len(times) // 2]
        results[mode].update({
            "img_per_s": round(len(files) / sec, 2),
            "wall_s": round(sec, 2),
            "runs_s_sorted": [round(t, 3) for t in times],
        })
        print(json.dumps({
            "metric": f"perception {mode} mode ({args.frames} frames {W}x{H}, batch {args.batch_size})",
            "value": results[mode].get("img_per_s"),
            "unit": "img/s",
            "details": results[mode],
            "backend": jax.devices()[0].platform,
        }))

    # Detection-set overlap vs the default mode (VERDICT r2 item 1: the
    # speedup claim needs a per-mode detection diff next to the rates).
    base = next((m for m in ("roi", "device", "host", "pure", "reference") if m in keys_of), None)
    for mode, keys in keys_of.items():
        if base is None or mode == base:
            continue
        results[mode]["overlap_vs_" + base] = {
            "common": len(keys & keys_of[base]),
            "only_" + mode: sorted(map(str, keys - keys_of[base]))[:40],
            "only_" + base: sorted(map(str, keys_of[base] - keys))[:40],
        }

    if not args.no_save:
        with open(os.path.join(REPO, "benchmarks", "perception_result.json"), "w") as f:
            json.dump({"res": args.res, "frames": args.frames,
                       "batch_size": args.batch_size, "modes": results,
                       "backend": jax.devices()[0].platform}, f, indent=1)


if __name__ == "__main__":
    main()

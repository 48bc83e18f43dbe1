"""Sweep the roi-mode tuning knobs on the bench scene (real TPU).

Knobs: VICAN_TPU_ROI_CHUNK (wider per-tier chunk loop iterations) and
VICAN_TPU_PIPELINE_DEPTH (feed/drain batches in flight).
VICAN_TPU_ROI_TILE is read once at import (ops/roi.TILE) — sweep it by
re-running this script with the env var set.  Configs are
INTERLEAVED across reps (host CPU speed drifts minute-to-minute on this
machine — same rule as perception_bench.py), and every config change that
alters the compiled program pays its cold compile during rep 0 (warmup).

Prints one line per config: median img/s over the interleaved reps.
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    # honor the env var before the first backend touch (the axon
    # sitecustomize pins jax_platforms=axon regardless; see CLAUDE.md)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from vican_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunks", default="0,256")
    ap.add_argument("--depths", default="2,3")
    args = ap.parse_args()

    from vican_tpu.dataset import Dataset
    from vican_tpu.perception import estimate_pose_batched
    from vican_tpu.synthetic import render_cube_scene

    W, H = 1280, 720
    root = os.path.join(REPO, "_synthetic",
                        f"perception_bench_{W}x{H}_{args.frames}")
    if not os.path.isdir(root):
        render_cube_scene(root, [(2.2, 0.3, 1.2)], args.frames, seed=4,
                          res=(W, H))
    ds = Dataset(root)
    files = ds.im_data["filename"]
    cams = ds.im_data["cam"]

    configs = [(int(c), int(d))
               for c in args.chunks.split(",")
               for d in args.depths.split(",")]

    def run(chunk, depth):
        os.environ["VICAN_TPU_ROI_CHUNK"] = str(chunk)
        os.environ["VICAN_TPU_PIPELINE_DEPTH"] = str(depth)
        try:
            t0 = time.perf_counter()
            edges = estimate_pose_batched(
                files, cams, aruco="DICT_4X4_1000",
                marker_size=0.48 * 0.575,
                corner_refine="CORNER_REFINE_APRILTAG", brightness=0,
                contrast=0, flags="SOLVEPNP_IPPE_SQUARE",
                batch_size=args.batch_size, pipeline_mode="roi",
                verbose=False,
            )
            return time.perf_counter() - t0, len(edges)
        finally:
            os.environ.pop("VICAN_TPU_ROI_CHUNK", None)
            os.environ.pop("VICAN_TPU_PIPELINE_DEPTH", None)

    times = {cfg: [] for cfg in configs}
    dets = {}
    for cfg in configs:  # warmup / compile pass per config
        warm, dets[cfg] = run(*cfg)
        print(f"# warmup chunk={cfg[0]} depth={cfg[1]}: {warm:.1f}s "
              f"({dets[cfg]} edges)", flush=True)
    for _rep in range(args.reps):
        for cfg in configs:
            times[cfg].append(run(*cfg)[0])
    for cfg in configs:
        ts = sorted(times[cfg])
        sec = ts[len(ts) // 2]
        print(json.dumps({
            "chunk": cfg[0], "depth": cfg[1],
            "img_per_s": round(len(files) / sec, 2),
            "runs_s_sorted": [round(t, 3) for t in ts],
            "edges": dets[cfg],
        }), flush=True)


if __name__ == "__main__":
    main()

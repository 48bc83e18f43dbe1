"""VICAN tutorial — the reference's main.ipynb as a script.

Mirrors the notebook flow (reference main.ipynb cells 1-11) with the same
hyperparameters: (1) calibrate the marker cube from its own capture,
(2) detect markers across the camera-network capture, (3) solve the camera
network, (4) compare against ground truth, (5) plot.

Usage:
    python examples/tutorial.py --dataset ./small_room --obj-dataset ./cube_calib
    python examples/tutorial.py --synthetic   # no datasets needed: renders one

The distributed datasets ship precomputed ``cam_marker_edges.pt`` files
(reference README.md:18); pass ``--use-cached-edges`` to skip detection.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS on hosts whose sitecustomize pins a platform (the
# axon tunnel re-applies itself at startup; the config update wins).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from vican_tpu.bipgo import bipartite_se3sync, object_bipartite_se3sync
from vican_tpu.cam import estimate_pose_mp
from vican_tpu.dataset import Dataset
from vican_tpu.evaluation import evaluate_calibration
from vican_tpu.ops.shoelace import polygon_area
from vican_tpu.serialization import load_edges, save_edges

MARKER_SIZE = 0.48 * 0.575
MARKER_IDS = list(map(str, range(24)))


def detect(dataset, path, use_cached):
    cache = os.path.join(path, "cam_marker_edges.pt")
    if use_cached and os.path.isfile(cache):
        print(f"loading cached edges from {cache}")
        return load_edges(cache)
    edges = estimate_pose_mp(
        cams=dataset.im_data["cam"],
        im_filenames=dataset.im_data["filename"],
        aruco="DICT_4X4_1000",
        marker_size=MARKER_SIZE,
        corner_refine="CORNER_REFINE_APRILTAG",
        marker_ids=MARKER_IDS,
        flags="SOLVEPNP_IPPE_SQUARE",
        brightness=-150,
        contrast=120,
    )
    save_edges(cache, edges)
    return edges


def make_synthetic(root, n_room=40, n_cube=60, res=(1280, 720)):
    """Render a small synthetic pair of datasets (room + cube calib) via the
    shared scene recipe (vican_tpu.synthetic.render_cube_scene)."""
    from vican_tpu.synthetic import calibration_sweep, render_cube_scene

    global MARKER_SIZE
    MARKER_SIZE = 0.138
    room = os.path.join(root, "small_room_synth")
    cube = os.path.join(root, "cube_calib_synth")
    if not os.path.isdir(room):
        print("rendering synthetic datasets...")
    render_cube_scene(
        room, [(3, 0, 1.2), (0, 3, 1.5), (-3, 0, 1.0), (0, -3, 1.3)],
        n_room, seed=1, res=res, marker_size=MARKER_SIZE, wander=True,
    )
    # calibration capture: one close-up camera, DETERMINISTIC face sweep.
    # Random tumbling (the reference uses 2000 frames of it,
    # reference render.py:393-432) under-covers faces at tutorial scale
    # (tens of frames): some marker ends up with only oblique views, its
    # edges fail the reprojection keep-filter, the object stage cannot
    # recover it, and the camera stage then drops its observations.  The
    # sweep turns each face toward the camera at several spin angles so
    # every marker gets frontal views while the tilt keeps the marker
    # graph connected.
    cube_pos = (1.1, 0.2, 1.1)
    render_cube_scene(
        cube, [cube_pos], n_cube, seed=2, res=res,
        marker_size=MARKER_SIZE,
        traj=calibration_sweep(n_cube, cube_pos),
    )
    return room, cube


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="./small_room")
    ap.add_argument("--obj-dataset", default="./cube_calib")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--use-cached-edges", action="store_true")
    ap.add_argument("--tmax", type=int, default=2000)
    ap.add_argument("--quick", action="store_true",
                    help="tiny synthetic config (CI smoke: fewer frames, 640x360)")
    args = ap.parse_args()

    # The notebook's area**6 translation weights assume dense captures
    # (2000 frames); on the small synthetic fixture they concentrate all
    # weight on a handful of edges, so synthetic mode uses area**2.
    obj_t_power = 6.0
    if args.synthetic:
        if args.quick:
            args.dataset, args.obj_dataset = make_synthetic(
                "./_synthetic_quick", n_room=16, n_cube=24, res=(960, 540)
            )
        else:
            args.dataset, args.obj_dataset = make_synthetic("./_synthetic")
        obj_t_power = 2.0

    dataset = Dataset(root=args.dataset)
    obj_dataset = Dataset(root=args.obj_dataset)

    # 1. Calibrate object (cube with 24 markers) — main.ipynb cell 3
    aux = detect(obj_dataset, args.obj_dataset, args.use_cached_edges)
    obj_pose_est = object_bipartite_se3sync(
        aux,
        noise_model_r=lambda e: 0.01 * polygon_area(e["corners"]) ** 2,
        noise_model_t=lambda e: 0.001 * polygon_area(e["corners"]) ** obj_t_power,
        edge_filter=lambda e: e["reprojected_err"] < 0.1,
        maxiter=4,
        lsqr_solver="conjugate_gradient",
        dtype=np.float64,
    )
    print(f"object calibration: {len(obj_pose_est)} marker poses")
    if args.synthetic and len(obj_pose_est) != len(MARKER_IDS):
        # the synthetic fixtures are sized so every marker calibrates; a
        # shortfall means the camera stage would silently drop edges
        missing = sorted(set(MARKER_IDS) - set(obj_pose_est), key=int)
        raise RuntimeError(
            f"object stage recovered {len(obj_pose_est)}/{len(MARKER_IDS)} "
            f"markers (missing {missing}) — the synthetic fixture should "
            "cover all of them; see make_synthetic"
        )

    # 2. Detect markers in the room capture — cell 5
    cam_marker_edges = detect(dataset, args.dataset, args.use_cached_edges)

    # 3. Camera-network optimization — cell 7
    edges = {
        k: v for k, v in cam_marker_edges.items() if int(k[1].split("_")[0]) < args.tmax
    }
    pose_est = bipartite_se3sync(
        edges,
        constraints=obj_pose_est,
        noise_model_r=lambda e: 0.001 * polygon_area(e["corners"]) ** 1.0,
        noise_model_t=lambda e: 0.001 * polygon_area(e["corners"]) ** 2.0,
        edge_filter=lambda e: e["reprojected_err"] < 0.05,
        maxiter=4,
        lsqr_solver="conjugate_gradient",
        dtype=np.float32,
    )

    # 4. Ground-truth comparison — cell 9
    report = evaluate_calibration(dataset.cams, pose_est)
    print(report)

    # 5. 2D plot — cell 11
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from vican_tpu.plot import plot2D

        fig = plt.figure(figsize=(10, 10))
        ax = fig.add_subplot(111)
        plot2D(ax, pose_est, idx=report.valid_cam_ids, left_gauge=report.gauge.inv(),
               view="xy", marker="x", s=30, c="blue")
        plot2D(ax, dataset.cams, view="xy", marker="x", s=30, c="red")
        if dataset.object:
            plot2D(ax, dataset.object, view="xy", marker=".", s=15, c=[[0, 0.6, 0, 0.4]])
        plt.axis("equal")
        plt.xlabel("x (m)")
        plt.ylabel("y (m)")
        plt.legend(["Estimates", "Ground-truth", "Object"])
        out_png = "calibration.png"
        plt.savefig(out_png, dpi=100)
        print(f"wrote {out_png}")
    except ImportError as e:  # matplotlib genuinely absent: skip the plot;
        # any other plotting failure is a real regression and must surface
        print(f"(plot skipped: {e})")


if __name__ == "__main__":
    main()

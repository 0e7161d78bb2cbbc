"""Camera-calibration demo — the st3 main analog. Uses the reference repo's
REAL corner dataset when mounted (st3-calibration/calib/*.txt, 5x8 board,
2.8 cm squares), else a synthetic scene.

Run:  python examples/calibration_demo.py [--cpu]
"""

import argparse
import glob
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

CALIB_DIR = "/root/reference/st3-calibration/calib"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    from slam_tricks_tpu.pipelines.calibration import calibrate
    from slam_tricks_tpu.utils import get_logger
    from slam_tricks_tpu.utils.io import board_model_points, read_cbcorners

    log = get_logger("calib_demo")

    if os.path.isdir(CALIB_DIR):
        files = sorted(glob.glob(os.path.join(CALIB_DIR, "*.txt")))
        views = []
        rows = cols = None
        for f in files:
            rows, cols, corners = read_cbcorners(f)
            views.append(corners)
        board = board_model_points(rows, cols, 0.028)
        image_pts = jnp.asarray(np.stack(views))
        log.info("real dataset: %d views of a %dx%d board", len(files), rows, cols)
    else:
        from slam_tricks_tpu.sim.calib_scene import make_calib_scene

        scene = make_calib_scene(n_views=9, noise=0.1)
        board = np.asarray(scene.board_pts)
        image_pts = scene.image_pts
        log.info("synthetic dataset: 9 views")

    res = calibrate(jnp.asarray(board), image_pts, max_iters=80)
    log.info("reprojection RMS: %.4f px in %d LM iterations",
             float(res.rms_px), int(res.iterations))
    log.info("K: fx=%.2f fy=%.2f cx=%.2f cy=%.2f",
             float(res.intrinsics.fx), float(res.intrinsics.fy),
             float(res.intrinsics.cx), float(res.intrinsics.cy))
    log.info("dist: k1=%.4f k2=%.4f k3=%.4f p1=%.5f p2=%.5f",
             float(res.distortion.k1), float(res.distortion.k2),
             float(res.distortion.k3), float(res.distortion.p1),
             float(res.distortion.p2))


if __name__ == "__main__":
    sys.exit(main())

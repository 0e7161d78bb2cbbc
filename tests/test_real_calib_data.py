"""Parity test on the reference repo's REAL calibration dataset
(st3-calibration/calib/1.txt..9.txt: 5x8 board, 2.8 cm squares per
st3-calibration/src/main.cpp:4). Runs the full Zhang pipeline (closed-form init
+ joint refinement) on the same data the reference processes and requires
sub-pixel reprojection RMS. Skipped when the reference checkout is absent."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

CALIB_DIR = "/root/reference/st3-calibration/calib"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CALIB_DIR), reason="reference dataset not mounted")


def test_zhang_on_reference_dataset():
    from slam_tricks_tpu.pipelines.calibration import calibrate
    from slam_tricks_tpu.utils.io import board_model_points, read_cbcorners

    files = sorted(glob.glob(os.path.join(CALIB_DIR, "*.txt")))
    assert len(files) == 9
    views = []
    rows = cols = None
    for f in files:
        r, c, corners = read_cbcorners(f)
        rows, cols = r, c
        views.append(corners)
    board = board_model_points(rows, cols, 0.028)
    image_pts = jnp.asarray(np.stack(views))
    res = calibrate(jnp.asarray(board), image_pts, max_iters=80)
    rms = float(res.rms_px)
    # real detector corners: the joint optimum should be sub-pixel
    assert rms < 1.0, rms
    # plausible pinhole geometry
    assert 500 < float(res.intrinsics.fx) < 5000
    assert 0.8 < float(res.intrinsics.fx) / float(res.intrinsics.fy) < 1.25
    # all boards in front of their cameras
    assert (np.asarray(res.poses.t)[:, 2] > 0).all()

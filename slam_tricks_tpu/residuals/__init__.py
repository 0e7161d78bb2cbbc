"""Residual/model layer: closed-form residuals for every reference problem class."""

from slam_tricks_tpu.residuals import calib, epipolar, icp, posegraph, robust, simple  # noqa: F401
from slam_tricks_tpu.residuals.camera import (  # noqa: F401
    DistCoeffs,
    Intrinsics,
    distort_normalized,
    distort_pixel,
    undistort_point_gn,
    undistort_points_fast,
    undistort_points_gn,
)
from slam_tricks_tpu.residuals.reprojection import (  # noqa: F401
    reproject_normalized,
    reproject_normalized_jacobians,
    reproject_pixel,
)

"""Image front-ends (reference L4): chessboard detection, undistortion,
optical flow, panorama."""

from slam_tricks_tpu.frontend.chessboard import (  # noqa: F401
    corner_likelihood,
    detect_corners,
    estimate_orientations,
    grow_chessboards,
    refine_corners_subpixel,
)

"""Image front-ends (reference L4): chessboard detection, undistortion,
optical flow, panorama."""

from slam_tricks_tpu.frontend.chessboard import (  # noqa: F401
    corner_likelihood,
    detect_corners,
    estimate_orientations,
    grow_chessboards,
    refine_corners_subpixel,
    verify_corners,
)
from slam_tricks_tpu.frontend.direct import direct_pose_estimate, select_pixels  # noqa: F401
from slam_tricks_tpu.frontend.optical_flow import (  # noqa: F401
    build_pyramid,
    grid_seed_points,
    lk_track,
)
from slam_tricks_tpu.frontend.orb import (  # noqa: F401
    OrbFeatures,
    orb_detect,
    orb_match,
)

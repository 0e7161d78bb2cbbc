"""Direct (initialization) solvers: SVD pipelines + vmapped RANSAC (SURVEY §7 step 7)."""

from slam_tricks_tpu.initialization.eightpoint import (  # noqa: F401
    decompose_essential,
    essential_8pt,
    essential_from_fundamental,
    fundamental_8pt,
    hartley_normalize,
    recover_pose,
    triangulate_midpoint,
)
from slam_tricks_tpu.initialization.homography import apply_h, homography_dlt  # noqa: F401
from slam_tricks_tpu.initialization.ransac import (  # noqa: F401
    RansacResult,
    ransac,
    ransac_iterative_refit,
)
from slam_tricks_tpu.initialization.robust_epipolar import (  # noqa: F401
    robust_fundamental,
)
from slam_tricks_tpu.initialization.zhang import (  # noqa: F401
    calibrate_closed_form,
    extrinsics_from_homography,
    intrinsics_from_homographies,
)

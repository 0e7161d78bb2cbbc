"""State estimation: SE(3) error-state Kalman filter (st4's intended solver)
and strapdown INS mechanization (st14)."""

from slam_tricks_tpu.estimation.eskf import (  # noqa: F401
    ESKFState,
    filter_trajectory,
    predict,
    update_pose,
)
from slam_tricks_tpu.estimation.ins import (  # noqa: F401
    ELLIPSOIDS,
    INSState,
    mechanize_step,
    mechanize_trajectory,
    normal_gravity,
    radii,
)

"""Deterministic simulators (the reference's L6 layer, SURVEY §2)."""

from slam_tricks_tpu.sim.ba_scene import (  # noqa: F401
    BAObservations,
    BAScene,
    make_scene,
    make_loop_scene,
    make_trajectory_scene,
    perturb_scene,
)
from slam_tricks_tpu.sim.calib_scene import CalibScene, make_calib_scene  # noqa: F401
from slam_tricks_tpu.sim.distortion import (  # noqa: F401
    box_segments,
    lidar_sweep,
    rolling_shutter_points,
)
from slam_tricks_tpu.sim.trajectory import (  # noqa: F401
    PoseGraphProblem,
    make_pose_graph,
    spiral_poses,
)
from slam_tricks_tpu.sim.two_view import TwoViewScene, make_two_view  # noqa: F401

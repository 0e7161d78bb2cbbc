"""Distributed solvers: mesh + shard_map observation sharding, psum-reduced
normal equations, replicated trust-region control (SURVEY §2.2/§7 step 6)."""

from slam_tricks_tpu.parallel.partition import (  # noqa: F401
    build_local_pairs,
    partition_obs_by_landmark,
)
from slam_tricks_tpu.parallel.sharded_ba import (  # noqa: F401
    make_ba_solver,
    pad_obs_to_multiple,
)
from slam_tricks_tpu.parallel.loop_dist import (  # noqa: F401
    build_dist_loop_work,
    make_ba_solver_loop_dist,
)

"""Solver layer: vmapped dense GN/LM + block-sparse Schur BA solver."""

from slam_tricks_tpu.solvers.common import SolveResult  # noqa: F401
from slam_tricks_tpu.solvers.gn import gauss_newton, gauss_newton_batched  # noqa: F401
from slam_tricks_tpu.solvers.lm import levenberg_marquardt  # noqa: F401
from slam_tricks_tpu.solvers.posegraph import (  # noqa: F401
    build_chain_work,
    solve_pose_graph,
    solve_pose_graph_chain,
)
from slam_tricks_tpu.solvers.posegraph_sim3 import (  # noqa: F401
    solve_pose_graph_sim3,
)
from slam_tricks_tpu.solvers.schur import solve_ba, solve_ba_jit  # noqa: F401
from slam_tricks_tpu.solvers.banded_flat import (  # noqa: F401
    banded_covariances,
    banded_pose_covariances,
    build_banded_work,
    solve_ba_banded,
)
from slam_tricks_tpu.solvers.loop_flat import (  # noqa: F401
    build_loop_work,
    loop_pose_covariances,
    solve_ba_loop,
)
from slam_tricks_tpu.solvers.schur_flat import (  # noqa: F401
    build_flat_work,
    solve_ba_flat,
)
from slam_tricks_tpu.solvers.sliding_window import (  # noqa: F401
    WindowPrior,
    run_sliding_window,
    solve_window,
)
from slam_tricks_tpu.solvers.incremental import (  # noqa: F401
    IncrementalState,
    smoother_arrive,
    smoother_init,
)

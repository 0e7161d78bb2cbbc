"""Lie groups and manifold interface (vmappable, dtype-polymorphic)."""

from slam_tricks_tpu.manifolds import se2, se3, sim3, so2, so3  # noqa: F401
from slam_tricks_tpu.manifolds.manifold import (  # noqa: F401
    Manifold,
    batched,
    euclidean,
    lie,
    product,
    so3_r3,
)
from slam_tricks_tpu.manifolds.se2 import SE2  # noqa: F401
from slam_tricks_tpu.manifolds.se3 import SE3  # noqa: F401
from slam_tricks_tpu.manifolds.sim3 import Sim3  # noqa: F401

"""Metrics (reference L6/eval role: ATE, reprojection stats)."""

from slam_tricks_tpu.evaluation.metrics import (  # noqa: F401
    ErrorStats,
    align_trajectories,
    ate_rmse,
    ate_translation_rmse,
    reprojection_rms,
    stats,
)

"""Visualization / export (reference L7 role, matplotlib-backed)."""

from slam_tricks_tpu.viz.plots import (  # noqa: F401
    hessian_sparsity_image,
    plot_ba_scene,
    plot_trajectories,
    save_csv,
)

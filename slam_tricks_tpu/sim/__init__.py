"""Deterministic simulators (the reference's L6 layer, SURVEY §2)."""

from slam_tricks_tpu.sim.ba_scene import (  # noqa: F401
    BAObservations,
    BAScene,
    make_scene,
    perturb_scene,
)

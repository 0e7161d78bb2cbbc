"""End-to-end problem pipelines (the reference's L5 application layer)."""

from slam_tricks_tpu.pipelines.two_view import TwoViewResult, solve_two_view  # noqa: F401

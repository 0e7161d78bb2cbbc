"""End-to-end real-data smoke test: monocular VO + BA on the reference's
KITTI frames (examples/kitti_vo_demo.py) — LK tracking -> robust epipolar
gate -> two-view init -> PnP chaining -> flat-Schur BA -> trim rounds.
The reference's real-data validation culture (SURVEY §4) on the flagship
BA path (VERDICT r1 item 8)."""

import os
import sys

import pytest

REF = "/root/reference/st13-directmethod/img"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference KITTI frames not mounted")


@pytest.mark.slow
def test_kitti_vo_end_to_end():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import kitti_vo_demo

    rms_px, fwd_frac, max_rot_deg = kitti_vo_demo.main(REF)
    # LK chaining over 5 frames without re-detection drifts ~1-3 px; the gate
    # is that BA lands in that regime (a broken pipeline reads 10-100x this)
    assert rms_px < 5.0, rms_px
    # the car drives straight: motion dominantly forward, small rotation
    assert fwd_frac > 0.7, fwd_frac
    assert max_rot_deg < 10.0, max_rot_deg

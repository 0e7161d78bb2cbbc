"""The batched analytic-Jacobian undistortion must match the generic
jacfwd-based path exactly (same Newton iteration, closed-form algebra)."""

import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.residuals import camera

INTR = camera.Intrinsics(*map(jnp.float64, (458.654, 457.296, 367.215, 248.375)))
DIST = camera.DistCoeffs(*map(jnp.float64, (-0.28340811, 0.07395907, 0.0, 0.00019359, 1.76187114e-05)))


def test_fast_matches_generic():
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.uniform([50, 50], [700, 430], size=(500, 2)))
    dist_px = camera.distort_pixels(INTR, DIST, px)
    generic = camera.undistort_points_gn(INTR, DIST, dist_px)
    fast = camera.undistort_points_fast(INTR, DIST, dist_px)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(generic), atol=1e-9)
    assert np.abs(np.asarray(fast - px)).max() < 1e-6

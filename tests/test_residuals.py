"""Residual-layer tests: undistortion round trip + cv2 cross-check (the
reference's own validation, st1-undistort/src/main.cpp:65-120), analytic vs
autodiff reprojection Jacobians (st17's dual-path validation), simple fits."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.manifolds import se3, so3
from slam_tricks_tpu.residuals import camera, reprojection, simple

RNG = np.random.default_rng(1)

# EuRoC-like intrinsics used by the reference harness (st1-undistort/src/main.cpp:124-129)
INTR = camera.Intrinsics(*map(jnp.float64, (458.654, 457.296, 367.215, 248.375)))
DIST = camera.DistCoeffs(*map(jnp.float64, (-0.28340811, 0.07395907, 0.0, 0.00019359, 1.76187114e-05)))


class TestUndistort:
    def test_roundtrip(self):
        """distort -> undistort recovers the pixel to sub-1e-6 px."""
        px = jnp.asarray(RNG.uniform([50, 50], [700, 430], size=(1000, 2)))
        dist_px = camera.distort_pixels(INTR, DIST, px)
        undist = camera.undistort_points_gn(INTR, DIST, dist_px)
        err = np.max(np.abs(np.asarray(undist - px)))
        assert err < 1e-6, err

    def test_vs_opencv(self):
        """Match cv::undistortPoints on the same model (the reference's
        authoritative baseline)."""
        px = np.array(RNG.uniform([50, 50], [700, 430], size=(500, 2)))
        K = np.array(INTR.K)
        d = np.array(DIST.to_opencv())
        dist_px = np.array(camera.distort_pixels(INTR, DIST, jnp.asarray(px)))
        cv_out = cv2.undistortPoints(
            dist_px.reshape(-1, 1, 2), K, d, P=K
        ).reshape(-1, 2)
        ours = np.array(camera.undistort_points_gn(INTR, DIST, jnp.asarray(dist_px)))
        # both should be close to the true pixel; ours (full Jacobian) at least as accurate
        our_err = np.abs(ours - px).max()
        cv_err = np.abs(cv_out - px).max()
        assert our_err < max(cv_err, 1e-6) * 1.5, (our_err, cv_err)

    def test_diagonal_variant_converges(self):
        """The reference's Juu/Jvv decoupled-Newton variant (undistort_pt.hpp:52-78)."""
        px = jnp.asarray(RNG.uniform([100, 100], [600, 400], size=(200, 2)))
        dist_px = camera.distort_pixels(INTR, DIST, px)
        out = jax.vmap(
            lambda p: camera.undistort_point_gn(INTR, DIST, p, iters=5, full_jacobian=False)
        )(dist_px)
        assert np.max(np.abs(np.asarray(out - px))) < 1e-2


class TestReprojectionJacobians:
    def test_analytic_matches_autodiff(self):
        """Analytic (2,6)/(2,3) Jacobians == jacfwd through so3_r3 retraction."""
        key = jax.random.PRNGKey(0)
        T = se3.random(key, jnp.float64)
        p = jnp.asarray(RNG.normal(size=3) + np.array([0, 0, 4.0]))
        uv = jnp.zeros(2, dtype=jnp.float64)

        pred, J_pose, J_point = reprojection.reproject_normalized_jacobians(T, p)

        def r_pose(d):
            T2 = se3.SE3(so3.retract(T.R, d[:3]), T.t + d[3:])
            return reprojection.reproject_normalized(T2, p, uv)

        def r_point(dp):
            return reprojection.reproject_normalized(T, p + dp, uv)

        J_pose_auto = jax.jacfwd(r_pose)(jnp.zeros(6, dtype=jnp.float64))
        J_point_auto = jax.jacfwd(r_point)(jnp.zeros(3, dtype=jnp.float64))
        np.testing.assert_allclose(np.asarray(J_pose), np.asarray(J_pose_auto), atol=1e-10)
        np.testing.assert_allclose(np.asarray(J_point), np.asarray(J_point_auto), atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(pred - uv),
            np.asarray(reprojection.reproject_normalized(T, p, uv)), atol=1e-12)


class TestSimpleFits:
    def test_parabola_lsq_golden(self):
        """Recover the reference's golden parabola {a,b,c}={1,2,3}
        (st7-ransac/src/main.cpp:4-14) from clean samples."""
        xs = jnp.linspace(-2, 2, 50).astype(jnp.float64)
        ys = 1.0 * xs ** 2 + 2.0 * xs + 3.0
        params = simple.parabola_fit_lsq(xs, ys)
        np.testing.assert_allclose(np.asarray(params), [1.0, 2.0, 3.0], atol=1e-10)

    def test_homography_residual_zero_at_truth(self):
        H = np.array([[1.1, 0.02, 3.0], [-0.01, 0.95, -2.0], [1e-4, -2e-4, 1.0]])
        src = RNG.uniform(-1, 1, size=(20, 2))
        srch = np.concatenate([src, np.ones((20, 1))], axis=1)
        dsth = (H @ srch.T).T
        dst = dsth[:, :2] / dsth[:, 2:]
        h8 = jnp.asarray(H.reshape(-1)[:8])
        r = jax.vmap(lambda s, d: simple.homography_residual(h8, s, d))(
            jnp.asarray(src), jnp.asarray(dst))
        assert np.max(np.abs(np.asarray(r))) < 1e-12

"""Direct-solver tests: 8-point E + pose recovery vs ground truth AND vs
OpenCV (the reference's validation strategy, st2-epipolar/src/main.cpp:102-177),
DLT homography vs cv2.findHomography, triangulation exactness, Zhang
closed-form, RANSAC outlier rejection, and the full two-view pipeline."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.initialization import (
    decompose_essential,
    essential_8pt,
    homography_dlt,
    ransac,
    recover_pose,
    triangulate_midpoint,
)
from slam_tricks_tpu.initialization.zhang import calibrate_closed_form
from slam_tricks_tpu.manifolds import se3, so3
from slam_tricks_tpu.pipelines import solve_two_view
from slam_tricks_tpu.residuals import simple
from slam_tricks_tpu.sim.two_view import make_two_view

RNG = np.random.default_rng(7)


class TestEightPoint:
    def test_essential_recovers_relative_pose(self):
        scene = make_two_view(n_points=60, seed=1)
        E = essential_8pt(scene.uv1, scene.uv2)
        R, t, n_good, X = recover_pose(E, scene.uv1, scene.uv2)
        # ground-truth relative pose, translation normalized
        R_ref = np.asarray(scene.T_12.R)
        t_ref = np.asarray(scene.T_12.t)
        t_ref = t_ref / np.linalg.norm(t_ref)
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-8)
        np.testing.assert_allclose(np.asarray(t), t_ref, atol=1e-8)
        assert int(n_good) == 60

    def test_vs_opencv(self):
        scene = make_two_view(n_points=80, noise=5e-4, seed=2)
        p1 = np.array(scene.uv1)
        p2 = np.array(scene.uv2)
        E_cv, _ = cv2.findEssentialMat(p1, p2, np.eye(3), method=cv2.LMEDS)
        E_cv = E_cv[:3] / np.linalg.norm(E_cv[:3])
        E = np.asarray(essential_8pt(scene.uv1, scene.uv2))
        # E defined up to sign; compare epipolar residual quality instead of E
        def resid(Emat):
            h1 = np.concatenate([p1, np.ones((len(p1), 1))], 1)
            h2 = np.concatenate([p2, np.ones((len(p2), 1))], 1)
            return np.abs(np.einsum("ni,ij,nj->n", h2, Emat, h1))

        ours = resid(E).mean()
        cv = resid(E_cv).mean()
        assert ours < cv * 1.5 + 1e-6, (ours, cv)

    def test_triangulation_exact(self):
        scene = make_two_view(n_points=20, seed=3)
        T12 = scene.T_12
        X, d1, d2 = jax.vmap(
            lambda a, b: triangulate_midpoint(T12.R, T12.t, a, b)
        )(scene.uv1, scene.uv2)
        # compare to points in cam-1 frame
        p_c1 = se3.act(scene.T1, scene.points)
        np.testing.assert_allclose(np.asarray(X), np.asarray(p_c1), atol=1e-8)
        assert np.all(np.asarray(d1) > 0) and np.all(np.asarray(d2) > 0)

    def test_two_view_pipeline(self):
        scene = make_two_view(n_points=60, noise=1e-4, seed=4)
        res = solve_two_view(scene.uv1, scene.uv2)
        T12_ref = scene.T_12
        t_ref = np.asarray(T12_ref.t) / np.linalg.norm(np.asarray(T12_ref.t))
        np.testing.assert_allclose(np.asarray(res.T_12.R), np.asarray(T12_ref.R), atol=2e-3)
        np.testing.assert_allclose(np.asarray(res.T_12.t), t_ref, atol=2e-3)


class TestHomography:
    def test_dlt_vs_opencv(self):
        H_true = np.array([[1.1, 0.05, 20.0], [-0.03, 0.97, -10.0], [1e-4, -5e-5, 1.0]])
        src = RNG.uniform(0, 500, size=(30, 2))
        srch = np.concatenate([src, np.ones((30, 1))], 1)
        dsth = (H_true @ srch.T).T
        dst = dsth[:, :2] / dsth[:, 2:]
        H = np.asarray(homography_dlt(jnp.asarray(src), jnp.asarray(dst)))
        H_cv, _ = cv2.findHomography(src, dst, 0)
        np.testing.assert_allclose(H / H[2, 2], H_true, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(H / H[2, 2], H_cv / H_cv[2, 2], rtol=1e-5, atol=1e-5)


class TestZhang:
    def test_closed_form_recovers_intrinsics(self):
        """Synthetic chessboard views -> Zhang init close to true K
        (calib.cpp:95-173 flow)."""
        from slam_tricks_tpu.sim.calib_scene import make_calib_scene

        scene = make_calib_scene(n_views=8, noise=0.0, seed=5)
        intr, skew, poses = calibrate_closed_form(scene.board_pts, scene.image_pts)
        assert abs(float(intr.fx) - scene.fx) / scene.fx < 1e-6
        assert abs(float(intr.fy) - scene.fy) / scene.fy < 1e-6
        assert abs(float(intr.cx) - scene.cx) < 1e-3
        assert abs(float(intr.cy) - scene.cy) < 1e-3
        # extrinsics: first view rotation close to truth
        R_err = so3.local(poses.R[0], scene.poses_true.R[0])
        assert np.abs(np.asarray(R_err)).max() < 1e-6


class TestRansac:
    def test_parabola_outlier_rejection(self):
        """50%-outlier parabola (st7 semantics) -> recovers {1,2,3}."""
        xs = jnp.asarray(RNG.uniform(-3, 3, 300))
        clean = xs ** 2 + 2 * xs + 3
        outlier = RNG.random(300) < 0.5
        ys = jnp.where(jnp.asarray(outlier),
                       clean + jnp.asarray(RNG.uniform(-30, 30, 300)), clean)
        data = {"x": xs, "y": ys}
        res = ransac(
            jax.random.PRNGKey(0), data,
            min_fit=lambda d: simple.parabola_fit_lsq(d["x"], d["y"]),
            residual_sq=lambda p, d: simple.parabola_residual(p, d["x"], d["y"]) ** 2,
            refit=lambda d, w: simple.parabola_fit_lsq(d["x"], d["y"], w),
            subset_size=3, n_hyps=256, inlier_thresh_sq=0.01)
        np.testing.assert_allclose(np.asarray(res.params), [1, 2, 3], atol=1e-6)
        # every clean point must be an inlier
        assert int(res.n_inliers) >= int((~outlier).sum())

"""Pose-graph solver + calibration pipeline end-to-end tests, with ATE metrics
(st4 pose_simulation.cpp:198-209 validation style)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.evaluation import ate_rmse, ate_translation_rmse
from slam_tricks_tpu.manifolds import se3
from slam_tricks_tpu.pipelines.calibration import calibrate
from slam_tricks_tpu.sim.calib_scene import make_calib_scene
from slam_tricks_tpu.sim.trajectory import make_pose_graph
from slam_tricks_tpu.solvers.posegraph import solve_pose_graph
from slam_tricks_tpu.residuals.camera import DistCoeffs


class TestPoseGraph:
    @pytest.mark.slow
    def test_drifted_chain_recovers(self):
        prob = make_pose_graph(n=30, odo_noise=0.02, meas_noise=0.0, seed=1)
        ate_before = float(ate_rmse(prob.poses_init, prob.poses_true))
        out = solve_pose_graph(prob.poses_init, prob.i_idx, prob.j_idx, prob.Z,
                               fixed_mask=prob.fixed_mask, max_iters=50)
        ate_after = float(ate_rmse(out.poses, prob.poses_true))
        # noiseless measurements -> exact recovery
        assert ate_after < 1e-8, (ate_before, ate_after)
        assert float(out.cost) < 1e-16

    @pytest.mark.slow
    def test_noisy_loop_closure_improves_drift(self):
        prob = make_pose_graph(n=40, odo_noise=0.03, meas_noise=0.003, seed=2)
        ate_before = float(ate_translation_rmse(prob.poses_init, prob.poses_true))
        out = solve_pose_graph(prob.poses_init, prob.i_idx, prob.j_idx, prob.Z,
                               fixed_mask=prob.fixed_mask, max_iters=50)
        ate_after = float(ate_translation_rmse(out.poses, prob.poses_true))
        assert ate_after < 0.4 * ate_before, (ate_before, ate_after)


class TestCalibrationPipeline:
    @pytest.mark.slow
    def test_joint_refinement_with_distortion(self):
        """Distorted, noisy corners: closed-form init (no distortion model) is
        biased; joint refinement recovers intrinsics AND distortion
        (st3 totalOptimization flow)."""
        dist_true = DistCoeffs(*map(jnp.float64, (-0.25, 0.07, 0.0, 1e-4, -5e-5)))
        scene = make_calib_scene(n_views=9, noise=0.1, dist=dist_true, seed=8)
        res = calibrate(scene.board_pts, scene.image_pts, max_iters=60)
        # converged to the statistical optimum: residual RMS ~ injected noise
        assert float(res.rms_px) < 0.15, float(res.rms_px)
        assert abs(float(res.intrinsics.fx) - scene.fx) < 1.0
        assert abs(float(res.intrinsics.fy) - scene.fy) < 1.0
        # individual k2/k3 are unidentifiable at the observed field radius
        # (~0.39); what must match is the EFFECTIVE distortion curve over the
        # observed range (in pixels)
        import jax as _jax
        from slam_tricks_tpu.residuals.camera import distort_normalized
        r = jnp.linspace(0.0, 0.38, 50)
        pts = jnp.stack([r, 0.6 * r], axis=1)
        d_true = _jax.vmap(lambda p: distort_normalized(dist_true, p))(pts)
        d_est = _jax.vmap(lambda p: distort_normalized(res.distortion, p))(pts)
        max_px_diff = float(jnp.max(jnp.abs(d_true - d_est))) * scene.fx
        assert max_px_diff < 0.5, max_px_diff

    @pytest.mark.slow
    def test_noiseless_exact(self):
        scene = make_calib_scene(n_views=6, noise=0.0, seed=9)
        res = calibrate(scene.board_pts, scene.image_pts, max_iters=40)
        assert float(res.rms_px) < 1e-8
        assert abs(float(res.intrinsics.fx) - scene.fx) < 1e-5

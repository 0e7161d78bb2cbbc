"""Sliding-window BA with marginalization priors (solvers/sliding_window):
prior-free window parity with the flat solver, prior math, and end-to-end
windowed odometry vs full-batch BA on a trajectory scene."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.evaluation.metrics import ate_translation_rmse
from slam_tricks_tpu.sim import make_trajectory_scene, perturb_scene
from slam_tricks_tpu.solvers import banded_flat, schur_flat, sliding_window


def test_window_solve_matches_flat_without_prior():
    dtype = np.float64
    scene = make_trajectory_scene(n_cams=16, n_points=300, track_len=4,
                                  seed=91, dtype=dtype)
    poses0, points0, fixed = perturb_scene(scene, seed=92)
    work = schur_flat.build_flat_work(scene.obs, 16, scene.n_points,
                                      dtype=dtype, use_cam_table=False)
    prior = sliding_window.empty_prior(4, dtype)
    ref = schur_flat.solve_ba_flat(poses0, points0, scene.obs, work,
                                   fixed_mask=fixed, max_iters=8)
    out = sliding_window.solve_window(poses0, points0, scene.obs, work,
                                      prior, fixed_mask=fixed, max_iters=8)
    np.testing.assert_allclose(float(out.cost), float(ref.cost), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.poses.t),
                               np.asarray(ref.poses.t), atol=1e-7)


def test_prior_pulls_to_anchor():
    """With a strong prior and no observations, the window solve must move
    the head poses to the prior mean."""
    dtype = np.float64
    scene = make_trajectory_scene(n_cams=8, n_points=100, track_len=3,
                                  seed=93, dtype=dtype)
    poses0, points0, _ = perturb_scene(scene, seed=94)
    obs = scene.obs._replace(weight=jnp.zeros_like(scene.obs.weight))
    work = schur_flat.build_flat_work(obs, 8, scene.n_points, dtype=dtype,
                                      use_cam_table=False)
    na = 2
    anchors = jax.tree_util.tree_map(lambda a: a[:na], scene.poses_true)
    prior = sliding_window.WindowPrior(
        H=1e6 * jnp.eye(6 * na, dtype=dtype),
        xi0=jnp.zeros(6 * na, dtype),
        anchor_R=anchors.R, anchor_t=anchors.t)
    fixed = jnp.zeros(8, bool).at[jnp.arange(2, 8)].set(True)
    out = sliding_window.solve_window(poses0, points0, obs, work, prior,
                                      fixed_mask=fixed, max_iters=20)
    np.testing.assert_allclose(np.asarray(out.poses.t[:na]),
                               np.asarray(anchors.t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.poses.R[:na]),
                               np.asarray(anchors.R), atol=1e-5)


def test_windowed_odometry_vs_batch():
    dtype = np.float64
    scene = make_trajectory_scene(n_cams=60, n_points=1500, track_len=5,
                                  seed=95, dtype=dtype)
    poses0, points0, fixed = perturb_scene(
        scene, pose_rot_noise=0.002, pose_trans_noise=0.01, point_noise=0.01,
        seed=96)

    bw = banded_flat.build_banded_work(scene.obs, 60, scene.n_points,
                                       dtype=dtype)
    batch = banded_flat.solve_ba_banded(poses0, points0, bw,
                                        fixed_mask=fixed, max_iters=15)
    ate_init = float(ate_translation_rmse(poses0, scene.poses_true))
    ate_batch = float(ate_translation_rmse(batch.poses, scene.poses_true))

    poses_sw, points_sw, diag = sliding_window.run_sliding_window(
        scene.obs, poses0, points0, window=20, shift=10, na=5, max_iters=12)
    ate_sw = float(ate_translation_rmse(poses_sw, scene.poses_true))

    assert all(np.isfinite(d["cost"]) for d in diag)
    # windowed estimation must recover most of the batch improvement
    assert ate_sw < 0.5 * ate_init, (ate_sw, ate_init)
    assert ate_sw < 5.0 * max(ate_batch, 1e-4), (ate_sw, ate_batch)


def test_single_window_covers_everything():
    """window == C degenerates to one batch solve (no marginalization)."""
    dtype = np.float64
    scene = make_trajectory_scene(n_cams=12, n_points=200, track_len=3,
                                  seed=97, dtype=dtype)
    poses0, points0, fixed = perturb_scene(scene, seed=98)
    poses_sw, _, diag = sliding_window.run_sliding_window(
        scene.obs, poses0, points0, window=12, shift=6, na=3, max_iters=10)
    assert len(diag) == 1
    # only camera 0 is fixed, so a gauge (rotation/scale about it) remains —
    # compare ATE after Sim3 alignment
    from slam_tricks_tpu.evaluation.metrics import align_trajectories

    aligned = align_trajectories(poses_sw, scene.poses_true)
    ate = float(ate_translation_rmse(aligned, scene.poses_true))
    a0 = align_trajectories(poses0, scene.poses_true)
    ate0 = float(ate_translation_rmse(a0, scene.poses_true))
    assert ate < 0.5 * ate0, (ate, ate0)

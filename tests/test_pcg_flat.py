"""Scatter-free flat PCG (solvers/pcg_flat.py): step-level parity with the
exact dense flat solve, full-solve convergence on the large-C trajectory
scene, and table invariants."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.sim import make_trajectory_scene, perturb_scene
from slam_tricks_tpu.solvers import schur_flat
from slam_tricks_tpu.solvers.pcg_flat import build_pcg_work, solve_rcs_pcg_flat


def _problem(n_cams=32, n_points=500, track_len=6, seed=2):
    scene = make_trajectory_scene(n_cams=n_cams, n_points=n_points,
                                  track_len=track_len, seed=seed,
                                  dtype=np.float64)
    poses0, points0, fixed = perturb_scene(
        scene, pose_rot_noise=0.002, pose_trans_noise=0.01, point_noise=0.01,
        seed=seed + 1)
    work = schur_flat.build_flat_work(scene.obs, scene.n_cams, scene.n_points,
                                      dtype=np.float64)
    pcgw = build_pcg_work(scene.obs, scene.n_cams, dtype=np.float64)
    return scene, poses0, points0, fixed, work, pcgw


def test_tables_cover_all_observations():
    scene, *_, pcgw = _problem()
    w = np.asarray(scene.obs.weight)
    assert float(np.asarray(pcgw.cam_mask).sum()) == w.sum()
    # every adjacency pair is a genuine within-track consecutive-camera pair
    cam = np.asarray(scene.obs.cam_idx)
    lm = np.asarray(scene.obs.lm_idx)
    a = np.asarray(pcgw.adj_a)
    b = np.asarray(pcgw.adj_b)
    m = np.asarray(pcgw.adj_mask) > 0
    assert np.all(lm[a[m]] == lm[b[m]])
    assert np.all(cam[a[m]] == cam[b[m]] + 1)


@pytest.mark.slow
def test_step_matches_dense_flat():
    scene, poses0, points0, fixed, work, pcgw = _problem()
    C, L = scene.n_cams, scene.n_points
    obs = scene.obs
    Hpp_f, gp_f, Hll_f, gl_f, W_f, _ = schur_flat._iteration_quantities(
        poses0, points0, obs, work, C, L)
    lam = jnp.asarray(1e-4)
    dp0, dl0, _, _ = schur_flat._solve_flat(Hpp_f, gp_f, Hll_f, gl_f, W_f,
                                            lam, fixed, work, C, L)
    dp1, dl1, _, _ = solve_rcs_pcg_flat(
        Hpp_f, gp_f, Hll_f, gl_f, W_f, obs.lm_idx, lam, fixed, work, pcgw,
        C, L, cg_iters=500, cg_tol=1e-14)
    np.testing.assert_allclose(dp1, dp0, atol=1e-8)
    np.testing.assert_allclose(dl1, dl0, atol=1e-8)


def test_full_solve_converges():
    scene, poses0, points0, fixed, work, pcgw = _problem()
    out = schur_flat.solve_ba_flat(
        poses0, points0, scene.obs, work, fixed_mask=fixed, max_iters=40,
        linear="pcg", pcg_work=pcgw, cg_iters=200, cg_tol=1e-10)
    rms = np.sqrt(float(out.cost) / float(jnp.sum(scene.obs.weight)))
    assert rms < 1e-8, rms

"""Schur-complement BA solver tests.

Key validations (SURVEY §7 step 5):
1. The Schur-eliminated step EXACTLY equals the step from solving the full
   (6C+3L) damped normal equations (algebraic identity check).
2. End-to-end LM on the st20 cube-room scene: noisy init -> recovers
   ground-truth poses/points (noiseless observations, final cost ~ 0).
3. Noisy observations: converges to the same optimum as an independent solve.
"""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.manifolds import se3
from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur


def small_scene(**kw):
    defaults = dict(n_per_wall=8, n_cams=6, pix_noise=0.0, seed=3)
    defaults.update(kw)
    return make_scene(**defaults)


class TestSchurStep:
    def test_schur_equals_dense_normal_equations(self):
        scene = small_scene()
        poses0, points0, fixed = perturb_scene(scene, seed=11)
        obs = scene.obs
        C, L = scene.n_cams, scene.n_points
        lam = jnp.asarray(1e-3, jnp.float64)

        r, Jp, Jl = schur._linearize_obs(poses0, points0, obs.cam_idx, obs.lm_idx,
                                         obs.uv, obs.weight)
        Hpp, Hll, gp, gl, W_obs = schur._assemble(r, Jp, Jl, obs.cam_idx,
                                                  obs.lm_idx, C, L)
        dp, dl = schur._schur_reduce(Hpp, Hll, gp, gl, W_obs, obs.cam_idx,
                                     obs.lm_idx, lam, C, L, fixed)

        # dense reference: build full J (2N, 6C+3L) and solve damped normal eqs
        N = obs.uv.shape[0]
        J = np.zeros((2 * N, 6 * C + 3 * L))
        for n in range(N):
            c, l = int(obs.cam_idx[n]), int(obs.lm_idx[n])
            J[2 * n:2 * n + 2, 6 * c:6 * c + 6] = np.asarray(Jp[n])
            J[2 * n:2 * n + 2, 6 * C + 3 * l:6 * C + 3 * l + 3] = np.asarray(Jl[n])
        rf = np.asarray(r).reshape(-1)
        H = J.T @ J
        g = J.T @ rf
        D = np.maximum(np.diag(H), 1e-12)
        A = H + float(lam) * np.diag(D)
        # gauge: fixed camera block -> identity rows/cols, zero rhs
        fixed_np = np.asarray(fixed)
        for c in np.nonzero(fixed_np)[0]:
            sl = slice(6 * c, 6 * c + 6)
            A[sl, :] = 0.0
            A[:, sl] = 0.0
            A[sl, sl] = np.eye(6)
            g[sl] = 0.0
        delta = np.linalg.solve(A, -g)
        dp_ref = delta[:6 * C].reshape(C, 6)
        dl_ref = delta[6 * C:].reshape(L, 3)

        np.testing.assert_allclose(np.asarray(dp), dp_ref, atol=1e-9)
        np.testing.assert_allclose(np.asarray(dl), dl_ref, atol=1e-9)


class TestPairedSchur:
    """The O(N)-memory within-track-pair assembly must be EXACT vs the dense
    (C,L,6,3) path — same S, same step, same LM trajectory."""

    def test_paired_step_equals_dense_step(self):
        scene = small_scene()
        poses0, points0, fixed = perturb_scene(scene, seed=11)
        obs = scene.obs
        C, L = scene.n_cams, scene.n_points
        lam = jnp.asarray(1e-3, jnp.float64)

        r, Jp, Jl = schur._linearize_obs(poses0, points0, obs.cam_idx,
                                         obs.lm_idx, obs.uv, obs.weight)
        Hpp, Hll, gp, gl, W_obs = schur._assemble(r, Jp, Jl, obs.cam_idx,
                                                  obs.lm_idx, C, L)
        dp_d, dl_d = schur._schur_reduce(Hpp, Hll, gp, gl, W_obs, obs.cam_idx,
                                         obs.lm_idx, lam, C, L, fixed)
        # small chunk to force multiple scan steps + padding
        pairs = schur.build_track_pairs(obs.cam_idx, obs.lm_idx, chunk=257,
                                        dtype=np.float64)
        dp_p, dl_p = schur._schur_reduce_paired(
            Hpp, Hll, gp, gl, W_obs, obs.cam_idx, obs.lm_idx, lam, C, L,
            fixed, pairs)
        np.testing.assert_allclose(np.asarray(dp_p), np.asarray(dp_d), atol=1e-10)
        np.testing.assert_allclose(np.asarray(dl_p), np.asarray(dl_d), atol=1e-10)

    def test_paired_full_solve_matches_dense(self):
        scene = small_scene(n_per_wall=10, n_cams=6, pix_noise=1e-3)
        poses0, points0, fixed = perturb_scene(scene, seed=9)
        pairs = schur.build_track_pairs(scene.obs.cam_idx, scene.obs.lm_idx,
                                        chunk=1024, dtype=np.float64)
        dense = schur.solve_ba(poses0, points0, scene.obs, fixed_mask=fixed,
                               max_iters=25)
        paired = jax.jit(schur.solve_ba,
                         static_argnames=("max_iters", "linear_solver"))(
            poses0, points0, scene.obs, fixed_mask=fixed, max_iters=25,
            linear_solver="paired", track_pairs=pairs)
        np.testing.assert_allclose(float(paired.cost), float(dense.cost),
                                   rtol=1e-8)


class TestBAEndToEnd:
    def test_noiseless_recovery(self):
        scene = small_scene(n_per_wall=12, n_cams=8)
        poses0, points0, fixed = perturb_scene(
            scene, pose_rot_noise=0.03, pose_trans_noise=0.05, point_noise=0.05, seed=7)
        final = schur.solve_ba(poses0, points0, scene.obs, fixed_mask=fixed,
                               max_iters=50)
        assert float(final.cost) < 1e-18, float(final.cost)
        # gauge-fixed first camera -> absolute pose recovery
        err = jax.vmap(se3.local)(final.poses, scene.poses_true)
        assert np.abs(np.asarray(err)).max() < 1e-6

    def test_noisy_observations_converge(self):
        scene = small_scene(n_per_wall=10, n_cams=6, pix_noise=1e-3)
        poses0, points0, fixed = perturb_scene(scene, seed=9)
        final = schur.solve_ba(poses0, points0, scene.obs, fixed_mask=fixed,
                               max_iters=50)
        n_eff = float(jnp.sum(scene.obs.weight))
        rms = np.sqrt(2.0 * float(final.cost) / (2.0 * n_eff))
        # residual RMS should be at the injected noise level
        assert rms < 2.5e-3, rms

    def test_jit_compiles_and_matches(self):
        scene = small_scene()
        poses0, points0, fixed = perturb_scene(scene, seed=13)
        eager = schur.solve_ba(poses0, points0, scene.obs, fixed_mask=fixed, max_iters=10)
        jitted = jax.jit(schur.solve_ba, static_argnames=("max_iters",))(
            poses0, points0, scene.obs, fixed_mask=fixed, max_iters=10)
        np.testing.assert_allclose(float(eager.cost), float(jitted.cost), rtol=1e-10)

"""PCG path validation: matrix-free Schur matvec == dense S product; PCG step
== dense step; full BA with linear_solver='pcg' converges to the same optimum.
Also: unrolled small-Cholesky == scipy."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.ops.smallchol import cho_solve_small, cholesky_small
from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur
from slam_tricks_tpu.solvers.pcg import make_schur_matvec, solve_rcs_pcg

RNG = np.random.default_rng(17)


class TestSmallCholesky:
    def test_matches_numpy(self):
        for n in (2, 3, 6, 9):
            A = RNG.normal(size=(50, n, n))
            A = A @ A.transpose(0, 2, 1) + n * np.eye(n)
            b = RNG.normal(size=(50, n))
            x = np.asarray(cho_solve_small(jnp.asarray(A), jnp.asarray(b)))
            x_ref = np.linalg.solve(A, b[..., None])[..., 0]
            np.testing.assert_allclose(x, x_ref, atol=1e-9)
            L = np.asarray(cholesky_small(jnp.asarray(A)))
            np.testing.assert_allclose(L, np.linalg.cholesky(A), atol=1e-9)


class TestPCG:
    def _blocks(self):
        scene = make_scene(n_per_wall=10, n_cams=6, seed=41)
        poses0, points0, fixed = perturb_scene(scene, seed=42)
        obs = scene.obs
        C, L = scene.n_cams, scene.n_points
        r, Jp, Jl = schur._linearize_obs(poses0, points0, obs.cam_idx,
                                         obs.lm_idx, obs.uv, obs.weight)
        Hpp, Hll, gp, gl, W_obs = schur._assemble(r, Jp, Jl, obs.cam_idx,
                                                  obs.lm_idx, C, L)
        return scene, obs, fixed, Hpp, Hll, gp, gl, W_obs, C, L

    def test_matvec_matches_dense(self):
        scene, obs, fixed, Hpp, Hll, gp, gl, W_obs, C, L = self._blocks()
        lam = jnp.asarray(1e-3, jnp.float64)

        def damp(H):
            d = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12)
            return H + lam * jax.vmap(jnp.diag)(d)

        Hpp_d, Hll_d = damp(Hpp), damp(Hll)
        Hll_inv = schur._inv3x3(Hll_d)
        mv = make_schur_matvec(Hpp_d, Hll_inv, W_obs, obs.cam_idx, obs.lm_idx, L)

        # dense S
        W = jnp.zeros((C, L, 6, 3)).at[obs.cam_idx, obs.lm_idx].add(W_obs)
        WHinv = jnp.einsum("clij,ljk->clik", W, Hll_inv)
        S = -jnp.einsum("clik,elmk->ciem", WHinv, W)
        S = S + jnp.eye(C)[:, None, :, None] * Hpp_d[:, :, None, :]

        x = jnp.asarray(RNG.normal(size=(C, 6)))
        y_free = mv(x)
        y_dense = jnp.einsum("ciej,ej->ci", S, x)
        np.testing.assert_allclose(np.asarray(y_free), np.asarray(y_dense), atol=1e-9)

    def test_pcg_step_matches_dense_step(self):
        scene, obs, fixed, Hpp, Hll, gp, gl, W_obs, C, L = self._blocks()
        lam = jnp.asarray(1e-3, jnp.float64)
        dp_dense, dl_dense = schur._schur_reduce(
            Hpp, Hll, gp, gl, W_obs, obs.cam_idx, obs.lm_idx, lam, C, L, fixed)
        dp_pcg, dl_pcg = solve_rcs_pcg(
            Hpp, Hll, gp, gl, W_obs, obs.cam_idx, obs.lm_idx, lam, fixed, L,
            cg_iters=300, cg_tol=1e-14)
        np.testing.assert_allclose(np.asarray(dp_pcg), np.asarray(dp_dense), atol=1e-8)
        np.testing.assert_allclose(np.asarray(dl_pcg), np.asarray(dl_dense), atol=1e-8)

    def test_ba_with_pcg_converges(self):
        scene = make_scene(n_per_wall=10, n_cams=6, seed=43)
        poses0, points0, fixed = perturb_scene(scene, seed=44)
        final = schur.solve_ba(poses0, points0, scene.obs, fixed_mask=fixed,
                               max_iters=30, linear_solver="pcg")
        assert float(final.cost) < 1e-16, float(final.cost)

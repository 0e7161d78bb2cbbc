"""PCG path validation: matrix-free Schur matvec == dense S product; PCG step
== dense step; full BA with linear_solver='pcg' converges to the same optimum.
Also: unrolled small-Cholesky == scipy."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.ops.smallchol import (cho_solve_small, cholesky_small,
                                           solve_lower_small,
                                           solve_lower_t_small)
from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur
from slam_tricks_tpu.solvers.pcg import (assemble_tridiag, build_band_pairs,
                                         make_schur_matvec,
                                         make_tridiag_precond, pcg,
                                         solve_rcs_pcg)

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

    def test_triangular_solves(self):
        A = RNG.normal(size=(20, 6, 6))
        A = A @ A.transpose(0, 2, 1) + 6 * np.eye(6)
        L = np.linalg.cholesky(A)
        B = RNG.normal(size=(20, 6, 4))
        X = np.asarray(solve_lower_small(jnp.asarray(L), jnp.asarray(B)))
        np.testing.assert_allclose(L @ X, B, atol=1e-10)
        Xt = np.asarray(solve_lower_t_small(jnp.asarray(L), jnp.asarray(B)))
        np.testing.assert_allclose(L.transpose(0, 2, 1) @ Xt, B, atol=1e-10)

    def test_tridiag_blocks_match_dense_S(self):
        scene, obs, fixed, Hpp, Hll, gp, gl, W_obs, C, L = self._blocks()
        lam = jnp.asarray(1e-3, jnp.float64)

        def damp(H):
            d = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12)
            return H + lam * jax.vmap(jnp.diag)(d)

        Hpp_d, Hll_d = damp(Hpp), damp(Hll)
        Hll_inv = schur._inv3x3(Hll_d)
        free = (~fixed).astype(jnp.float64)
        bp = build_band_pairs(obs.cam_idx, obs.lm_idx, dtype=np.float64)
        D, E = assemble_tridiag(Hpp_d, Hll_inv, W_obs, obs.cam_idx,
                                obs.lm_idx, free, bp)

        # dense S with identical gauge treatment
        W = jnp.zeros((C, L, 6, 3)).at[obs.cam_idx, obs.lm_idx].add(W_obs)
        WHinv = jnp.einsum("clij,ljk->clik", W, Hll_inv)
        S = -jnp.einsum("clik,elmk->ciem", WHinv, W)
        S = S + jnp.eye(C)[:, None, :, None] * Hpp_d[:, :, None, :]
        S = S * free[:, None, None, None] * free[None, None, :, None]
        S = S + (jnp.eye(C)[:, None, :, None]
                 * fixed.astype(jnp.float64)[:, None, None, None]
                 * jnp.eye(6)[None, :, None, :])
        S = np.asarray(S)
        for c in range(C):
            np.testing.assert_allclose(np.asarray(D[c]), S[c, :, c, :], atol=1e-9)
        for c in range(C - 1):
            np.testing.assert_allclose(np.asarray(E[c]), S[c + 1, :, c, :], atol=1e-9)

        # preconditioner application == dense solve with tridiag(S)
        T = np.zeros((C * 6, C * 6))
        for c in range(C):
            T[6 * c:6 * c + 6, 6 * c:6 * c + 6] = S[c, :, c, :]
        for c in range(C - 1):
            T[6 * (c + 1):6 * (c + 1) + 6, 6 * c:6 * c + 6] = S[c + 1, :, c, :]
            T[6 * c:6 * c + 6, 6 * (c + 1):6 * (c + 1) + 6] = S[c, :, c + 1, :]
        r = RNG.normal(size=(C, 6))
        z = np.asarray(make_tridiag_precond(D, E)(jnp.asarray(r)))
        z_ref = np.linalg.solve(T, r.reshape(-1)).reshape(C, 6)
        np.testing.assert_allclose(z, z_ref, atol=1e-8)

    def test_tridiag_precond_accelerates_pcg(self):
        scene, obs, fixed, Hpp, Hll, gp, gl, W_obs, C, L = self._blocks()
        lam = jnp.asarray(1e-6, jnp.float64)
        bp = build_band_pairs(obs.cam_idx, obs.lm_idx, dtype=np.float64)
        dp_j, dl_j = solve_rcs_pcg(Hpp, Hll, gp, gl, W_obs, obs.cam_idx,
                                   obs.lm_idx, lam, fixed, L,
                                   cg_iters=400, cg_tol=1e-13)
        dp_t, dl_t = solve_rcs_pcg(Hpp, Hll, gp, gl, W_obs, obs.cam_idx,
                                   obs.lm_idx, lam, fixed, L,
                                   cg_iters=400, cg_tol=1e-13, band_pairs=bp)
        np.testing.assert_allclose(np.asarray(dp_t), np.asarray(dp_j), atol=1e-7)

        # iteration-count comparison at equal tolerance
        def count_iters(band):
            dtype = jnp.float64

            def damp(H):
                d = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12)
                return H + lam * jax.vmap(jnp.diag)(d)

            Hpp_d, Hll_d = damp(Hpp), damp(Hll)
            Hll_inv = schur._inv3x3(Hll_d)
            free = (~fixed).astype(dtype)
            u = jnp.einsum("lij,lj->li", Hll_inv, gl)
            y = jax.ops.segment_sum(
                jnp.einsum("nij,nj->ni", W_obs, u[obs.lm_idx]), obs.cam_idx, C)
            b = -(gp - y) * free[:, None]
            base_mv = make_schur_matvec(Hpp_d, Hll_inv, W_obs, obs.cam_idx,
                                        obs.lm_idx, L)
            mv = lambda x: (base_mv(x * free[:, None]) * free[:, None]
                            + x * fixed.astype(dtype)[:, None])
            if band:
                D, E = assemble_tridiag(Hpp_d, Hll_inv, W_obs, obs.cam_idx,
                                        obs.lm_idx, free, bp)
                pre = make_tridiag_precond(D, E)
            else:
                M = (Hpp_d * free[:, None, None]
                     + jnp.eye(6)[None] * fixed.astype(dtype)[:, None, None])
                pre = lambda r: cho_solve_small(M, r)
            _, it = pcg(mv, b, pre, iters=400, tol=1e-10)
            return int(it)

        it_jacobi = count_iters(False)
        it_tri = count_iters(True)
        assert it_tri < it_jacobi, (it_tri, it_jacobi)

    def test_ba_with_pcg_converges(self):
        scene = make_scene(n_per_wall=10, n_cams=6, seed=43)
        poses0, points0, fixed = perturb_scene(scene, seed=44)
        final = schur.solve_ba(poses0, points0, scene.obs, fixed_mask=fixed,
                               max_iters=30, linear_solver="pcg")
        assert float(final.cost) < 1e-16, float(final.cost)


@pytest.mark.slow
def test_prefix_precond_f32_bench_scale():
    """ADVICE r2: the parallel-prefix bidiagonal substitution forms explicit
    products of the affine maps A_c = -L_c^{-1} F_c; verify in f32 at a
    bench-like C that it stays close to the backward-stable f64 solve of the
    same tridiagonal system (catches f32 product-chain blow-up)."""
    import numpy as np

    from slam_tricks_tpu.solvers.pcg import make_tridiag_precond

    rng = np.random.default_rng(5)
    C = 1024
    # BA-like blocks: SPD diagonal = G G^T + damping, strong sub-diagonal
    # coupling (adjacent cameras share most of a track's observations)
    G = rng.normal(size=(C, 6, 8))
    D = np.einsum("cik,cjk->cij", G, G) + 3.0 * np.eye(6)[None]
    E = 0.45 * rng.normal(size=(C - 1, 6, 6))
    r = rng.normal(size=(C, 6))

    # f64 reference: dense solve of the block-tridiagonal matrix
    M = np.zeros((C, 6, C, 6))
    for c in range(C):
        M[c, :, c, :] = D[c]
    for c in range(C - 1):
        M[c + 1, :, c, :] = E[c]
        M[c, :, c + 1, :] = E[c].T
    ref = np.linalg.solve(M.reshape(C * 6, C * 6), r.reshape(-1)).reshape(C, 6)

    out32 = make_tridiag_precond(jnp.asarray(D, jnp.float32),
                                 jnp.asarray(E, jnp.float32))(
        jnp.asarray(r, jnp.float32))
    rel = (np.linalg.norm(np.asarray(out32, np.float64) - ref)
           / np.linalg.norm(ref))
    # loose enough for f32 accumulation over 2*log2(C) prefix rounds, tight
    # enough to catch exponential product growth
    assert rel < 1e-3, rel

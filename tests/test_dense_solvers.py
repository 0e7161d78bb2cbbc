"""Dense GN/LM solver tests: PnP end-to-end (the st17 archetype), SE(3) ICP,
parabola/homography fits, batched solves, and a scipy least_squares cross-check
(authoritative-library validation per SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import least_squares

from slam_tricks_tpu.manifolds import lie, se3, euclidean, so3_r3
from slam_tricks_tpu.residuals import icp, reprojection, simple
from slam_tricks_tpu.solvers import gauss_newton, levenberg_marquardt

RNG = np.random.default_rng(2)


def make_pnp_problem(n=20, noise=0.0, seed=0):
    """Cube-wall scene like st17-ceres/src/main.cpp:37-87: world points in front
    of a camera, normalized-plane observations."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3))
    T_true = se3.SE3(
        jnp.asarray(np.asarray(
            se3.exp(jnp.asarray(rng.normal(size=6) * 0.3)).R)),
        jnp.asarray(rng.normal(size=3) * 0.5),
    )
    p_cam = np.asarray(se3.act(T_true, jnp.asarray(pts)))
    uv = p_cam[:, :2] / p_cam[:, 2:]
    uv = uv + rng.normal(size=uv.shape) * noise
    return T_true, jnp.asarray(pts), jnp.asarray(uv)


def pnp_residual(T, pts, uv):
    return jax.vmap(lambda p, o: reprojection.reproject_normalized(T, p, o))(pts, uv)


class TestPnP:
    def test_gn_recovers_pose_noiseless(self):
        T_true, pts, uv = make_pnp_problem()
        T0 = se3.retract(T_true, jnp.asarray(RNG.normal(size=6) * 0.1))
        res = gauss_newton(pnp_residual, T0, lie(se3), args=(pts, uv), iters=15)
        err = np.asarray(se3.local(res.x, T_true))
        assert np.abs(err).max() < 1e-8, err
        assert float(res.cost) < 1e-16

    def test_lm_recovers_pose_large_init_error(self):
        T_true, pts, uv = make_pnp_problem()
        T0 = se3.retract(T_true, jnp.asarray([0.5, -0.5, 0.3, 0.4, -0.3, 0.3]))
        res = levenberg_marquardt(pnp_residual, T0, lie(se3), args=(pts, uv), max_iters=60)
        assert float(res.cost) < 1e-16, float(res.cost)

    def test_so3_r3_block_parameterization(self):
        """The g2o-style SO3(+)R3 oplus (st20 test_g2o.h:36-39) solves the same
        problem."""
        T_true, pts, uv = make_pnp_problem()
        T0 = se3.retract(T_true, jnp.asarray(RNG.normal(size=6) * 0.2))
        res = levenberg_marquardt(pnp_residual, T0, so3_r3(), args=(pts, uv), max_iters=40)
        assert float(res.cost) < 1e-16

    def test_matches_scipy_final_cost(self):
        """Noisy problem: our LM reaches the same optimum as scipy's LM/TRF on
        the identical parameterized residual (Ceres-tolerance acceptance,
        BASELINE.json)."""
        T_true, pts, uv = make_pnp_problem(noise=1e-3)
        T0 = se3.retract(T_true, jnp.asarray(RNG.normal(size=6) * 0.1))
        res = levenberg_marquardt(pnp_residual, T0, lie(se3), args=(pts, uv), max_iters=100)

        def scipy_res(xi):
            T = se3.retract(T0, jnp.asarray(xi))
            return np.asarray(pnp_residual(T, pts, uv)).ravel()

        sp = least_squares(scipy_res, np.zeros(6), method="lm")
        ours = float(res.cost)
        theirs = 0.5 * float(sp.cost) * 2  # scipy cost = 0.5 sum r^2 already
        np.testing.assert_allclose(ours, 0.5 * np.sum(sp.fun ** 2), rtol=1e-6)

    def test_batched_pnp(self):
        """vmap over 32 independent PnP problems — one compiled solve."""
        problems = [make_pnp_problem(seed=i) for i in range(8)]
        pts = jnp.stack([p[1] for p in problems])
        uv = jnp.stack([p[2] for p in problems])
        T0 = jax.vmap(lambda T, d: se3.retract(T, d))(
            jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[p[0] for p in problems]),
            jnp.asarray(RNG.normal(size=(8, 6)) * 0.1),
        )
        solve = jax.vmap(
            lambda T, p, o: gauss_newton(pnp_residual, T, lie(se3), args=(p, o), iters=15)
        )
        res = solve(T0, pts, uv)
        assert np.asarray(res.cost).max() < 1e-15


class TestICP:
    def test_known_correspondence_se3(self):
        src = jnp.asarray(RNG.normal(size=(100, 3)))
        T_true = se3.exp(jnp.asarray([0.2, -0.1, 0.3, 0.4, 0.2, -0.5]))
        dst = se3.act(T_true, src)

        def resid(T, s, d):
            return jax.vmap(lambda a, b: icp.point_residual_se3(T, a, b))(s, d)

        res = gauss_newton(resid, se3.identity(jnp.float64), lie(se3), args=(src, dst), iters=10)
        assert np.abs(np.asarray(se3.local(res.x, T_true))).max() < 1e-9

    def test_unknown_correspondence_umeyama(self):
        # vanilla NN-ICP from identity init: rotation must stay inside the
        # convergence basin (same limitation as the reference's nobinding ICP)
        src = jnp.asarray(RNG.normal(size=(200, 3)))
        T_true = se3.exp(jnp.asarray([0.1, 0.2, -0.1, 0.1, -0.08, 0.12]))
        dst_full = se3.act(T_true, src)
        # shuffle to destroy correspondence
        perm = RNG.permutation(200)
        R, t, s, idx = icp.icp_iterate(src, dst_full[perm], n_outer=20)
        np.testing.assert_allclose(np.asarray(R), np.asarray(T_true.R), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t), np.asarray(T_true.t), atol=1e-6)

    def test_se2_icp_golden(self):
        """The reference's golden SE(2) problem: T21 = (pi/4, [2, 2])
        (st6-icp/src/binding.cpp:12-28)."""
        from slam_tricks_tpu.manifolds import se2

        pts = jnp.asarray(RNG.uniform(-3, 3, size=(50, 2)))
        T_true = se2.SE2(jnp.asarray(np.pi / 4), jnp.asarray([2.0, 2.0]))
        dst = se2.act(T_true, pts)

        def resid(T, s, d):
            return jax.vmap(lambda a, b: icp.point_residual_se2(T, a, b))(s, d)

        res = gauss_newton(resid, se2.identity(jnp.float64), lie(se2), args=(pts, dst), iters=10)
        assert abs(float(res.x.theta) - np.pi / 4) < 1e-10
        np.testing.assert_allclose(np.asarray(res.x.t), [2.0, 2.0], atol=1e-10)


class TestSimpleProblems:
    def test_parabola_gn(self):
        xs = jnp.asarray(RNG.uniform(-3, 3, size=(100,)))
        ys = 1.0 * xs ** 2 + 2.0 * xs + 3.0 + jnp.asarray(RNG.normal(size=100) * 0.01)

        def resid(p, x, y):
            return simple.parabola_residual(p, x, y)

        res = levenberg_marquardt(resid, jnp.zeros(3, dtype=jnp.float64),
                                  euclidean(3), args=(xs, ys), max_iters=30)
        np.testing.assert_allclose(np.asarray(res.x), [1, 2, 3], atol=0.05)

    def test_homography_gn(self):
        """st9 8-param homography via GN (projective.hpp:11-54)."""
        H = np.array([[1.05, 0.1, 2.0], [-0.04, 0.98, -1.0], [3e-4, -1e-4, 1.0]])
        src = jnp.asarray(RNG.uniform(-5, 5, size=(40, 2)))
        srch = np.concatenate([np.asarray(src), np.ones((40, 1))], 1)
        dsth = (H @ srch.T).T
        dst = jnp.asarray(dsth[:, :2] / dsth[:, 2:])

        def resid(h8, s, d):
            return jax.vmap(lambda a, b: simple.homography_residual(h8, a, b))(s, d)

        h0 = jnp.asarray(np.eye(3).reshape(-1)[:8])
        res = levenberg_marquardt(resid, h0, euclidean(8), args=(src, dst), max_iters=50)
        np.testing.assert_allclose(np.asarray(res.x), H.reshape(-1)[:8], atol=1e-8)

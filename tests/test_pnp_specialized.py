"""Specialized analytic-Jacobian PnP solver: must match the generic solver's
optimum and converge noiselessly."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.manifolds import se3
from slam_tricks_tpu.solvers.pnp import solve_pnp, solve_pnp_batched

RNG = np.random.default_rng(41)


def make_problem(seed, n=24):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 8], (n, 3)))
    T_true = se3.exp(jnp.asarray(rng.normal(size=6) * 0.3))
    pc = se3.act(T_true, pts)
    uv = pc[:, :2] / pc[:, 2:]
    T0 = se3.retract(T_true, jnp.asarray(rng.normal(size=6) * 0.1))
    return T_true, T0, pts, uv


def test_converges_noiseless():
    T_true, T0, pts, uv = make_problem(0)
    res = solve_pnp(T0, pts, uv, iters=12)
    assert float(res.cost) < 1e-20
    assert np.abs(np.asarray(se3.local(res.T, T_true))).max() < 1e-9


def test_batched():
    probs = [make_problem(i) for i in range(16)]
    T0 = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *[p[1] for p in probs])
    pts = jnp.stack([p[2] for p in probs])
    uv = jnp.stack([p[3] for p in probs])
    res = jax.jit(solve_pnp_batched)(T0, pts, uv)
    assert float(jnp.max(res.cost)) < 1e-18


def test_matches_generic_solver():
    from slam_tricks_tpu.manifolds import so3_r3
    from slam_tricks_tpu.residuals import reprojection
    from slam_tricks_tpu.solvers import gauss_newton

    rng = np.random.default_rng(9)
    T_true, T0, pts, uv = make_problem(9)
    uv_noisy = uv + jnp.asarray(rng.normal(size=uv.shape) * 1e-3)

    def pnp_res(T, p, o):
        return jax.vmap(lambda a, b: reprojection.reproject_normalized(T, a, b))(p, o)

    generic = gauss_newton(pnp_res, T0, so3_r3(), args=(pts, uv_noisy), iters=15)
    special = solve_pnp(T0, pts, uv_noisy, iters=15)
    np.testing.assert_allclose(float(special.cost), float(generic.cost), rtol=1e-8)

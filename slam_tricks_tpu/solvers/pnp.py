"""Specialized batched PnP Gauss-Newton with analytic Jacobians.

The generic `gauss_newton` linearizes via jacfwd (6 forward passes / problem /
iteration). PnP is the framework's most-benchmarked archetype (reference
SelfGaussNewton, st17-ceres/src/include/solver.hpp:387-462: 0.0192 ms for 7
iterations, the number to beat), so this solver uses the closed-form
reprojection Jacobians (residuals/reprojection.py) + unrolled 6x6 Cholesky —
one linearization costs a single vectorized pass over the observations.

Parameterization: SO3(+)R3, tangent [omega, dt] (same as the BA solver).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tricks_tpu.manifolds import se3, so3
from slam_tricks_tpu.ops.smallchol import cho_solve_small
from slam_tricks_tpu.residuals.reprojection import reproject_normalized_jacobians
from slam_tricks_tpu.solvers.common import HIGHEST


class PnPResult(NamedTuple):
    T: se3.SE3
    cost: jnp.ndarray
    iterations: jnp.ndarray


def solve_pnp(T0, points, uv, *, iters=10, damping=1e-8, xtol=1e-12,
              weights=None):
    """Single-problem GN PnP: T0 SE3 init (T_cw), points (M,3) world,
    uv (M,2) normalized-plane observations. vmap for batches."""
    dtype = points.dtype
    w = jnp.ones(points.shape[0], dtype) if weights is None else weights

    def linearize(T):
        pred, Jp, _ = jax.vmap(
            lambda p: reproject_normalized_jacobians(T, p))(points)
        r = (pred - uv) * jnp.sqrt(w)[:, None]
        J = Jp * jnp.sqrt(w)[:, None, None]
        H = jnp.einsum("mri,mrj->ij", J, J, precision=HIGHEST)
        g = jnp.einsum("mri,mr->i", J, r, precision=HIGHEST)
        cost = 0.5 * jnp.sum(r * r)
        return H, g, cost

    def step(carry, _):
        T, done, it = carry
        H, g, _ = linearize(T)
        A = H + damping * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-12))
        delta = cho_solve_small(A, -g)
        bad = jnp.any(~jnp.isfinite(delta))
        small = jnp.sum(delta * delta) < xtol * xtol
        d = jnp.where(done | bad, jnp.zeros_like(delta), delta)
        T_new = se3.SE3(so3.retract(T.R, d[:3]), T.t + d[3:])
        return (T_new, done | small | bad, it + jnp.where(done, 0, 1)), None

    init = (T0, jnp.zeros((), bool), jnp.zeros((), jnp.int32))
    (T, done, it), _ = jax.lax.scan(step, init, None, length=iters)
    _, _, cost = linearize(T)
    return PnPResult(T=T, cost=cost, iterations=it)


solve_pnp_batched = jax.vmap(
    lambda T0, pts, uv: solve_pnp(T0, pts, uv))

"""Vmapped dense Gauss-Newton — the minimum-slice solver (SURVEY §7 step 4).

Fixed iteration count, no data-dependent control flow except a convergence mask:
the whole solve compiles to one XLA computation and vmaps over problem
instances — the archetype the reference repeats by hand >=7 times
(SelfGaussNewton st17-ceres/src/include/solver.hpp:387-462, calib.cpp:282-422,
icp.hpp:27-48, undistort_pt.hpp:29-88, ...), replaced here by ONE generic
implementation.
"""

from functools import partial

import jax
import jax.numpy as jnp

from slam_tricks_tpu.solvers.common import SolveResult, _dtype_of, ata, atb, linearize, solve_damped_normal


def gauss_newton(residual_fn, x0, manifold, args=(), *, iters=10, damping=0.0,
                 xtol=1e-10, weights=None):
    """Dense Gauss-Newton on a manifold.

    residual_fn(x, *args) -> arbitrary-shape residuals (flattened internally).
    `weights`: optional per-residual-element nonneg weights (flat, same length
    as the flattened residual) — robust-loss / mask hook.
    Returns SolveResult. Early-stopped iterations are masked no-ops, so the
    compiled shape is static (vmap/pjit-friendly).
    """
    dtype = _dtype_of(x0)
    lam = jnp.asarray(damping, dtype)

    def step(carry, _):
        x, done, it = carry
        r, J = linearize(residual_fn, manifold, x, args)
        if weights is not None:
            w = jnp.ravel(weights).astype(dtype)
            r = r * jnp.sqrt(w)
            J = J * jnp.sqrt(w)[:, None]
        H = ata(J)
        g = atb(J, r)
        delta, bad = solve_damped_normal(H, g, lam)
        small = jnp.sum(delta * delta) < xtol * xtol
        x_new = manifold.retract(x, jnp.where(done | bad, jnp.zeros_like(delta), delta))
        new_done = done | small | bad
        return (x_new, new_done, it + jnp.where(done, 0, 1)), None

    init = (x0, jnp.zeros((), bool), jnp.zeros((), jnp.int32))
    (x, done, it), _ = jax.lax.scan(step, init, None, length=iters)
    r_final = jnp.ravel(residual_fn(x, *args))
    if weights is not None:
        r_final = r_final * jnp.sqrt(jnp.ravel(weights).astype(dtype))
    cost = 0.5 * jnp.sum(r_final * r_final)
    # final gradient norm for diagnostics
    return SolveResult(x=x, cost=cost, iterations=it, converged=done,
                       grad_norm=jnp.asarray(jnp.nan, dtype))


def gauss_newton_batched(residual_fn, x0_batch, manifold, args_batch=(), **kw):
    """vmap of `gauss_newton` over a leading batch axis of x0 and args —
    the "10k independent 2x2 GN problems on one chip" path (BASELINE st1)."""
    f = partial(gauss_newton, residual_fn, manifold=manifold, **kw)
    return jax.vmap(lambda x0, args: f(x0, args=args))(x0_batch, args_batch)

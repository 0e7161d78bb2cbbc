"""Levenberg-Marquardt with on-device trust-region control.

The whole solve — linearization, damped solve, gain-ratio accept/reject, lambda
adaptation — runs inside one `lax.while_loop`: no host round-trips per
iteration (SURVEY §7 "LM control flow on device"). Residual+Jacobian are only
recomputed after an ACCEPTED step (rejects reuse the stored linearization, like
Ceres' LM); the linearization lives in the loop carry with static shapes.

Control strategy (Nielsen/Madsen damping, the same family Ceres uses):
  gain rho = (cost - cost_new) / (0.5 delta^T (lam*D*delta - g))
  accept: lam *= max(1/3, 1 - (2 rho - 1)^3); nu = 2
  reject: lam *= nu; nu *= 2
"""

import jax
import jax.numpy as jnp

from slam_tricks_tpu.solvers.common import SolveResult, _dtype_of, ata, atb, linearize, solve_damped_normal


def levenberg_marquardt(residual_fn, x0, manifold, args=(), *, max_iters=50,
                        lambda_init=1e-4, xtol=1e-12, gtol=1e-12, ftol=0.0,
                        weights=None, use_marquardt_scaling=True, callback=None):
    """Returns SolveResult. vmappable over (x0, args) closures via jax.vmap.

    callback(iteration, cost, lam): optional per-iteration host callback — the
    Ceres IterationCallback role (reference: st17-ceres solver.hpp:215-245,
    update_state_every_iteration) via jax.debug.callback; metrics stream out of
    the on-device loop without breaking compilation."""
    dtype = _dtype_of(x0)

    def lin(x):
        r, J = linearize(residual_fn, manifold, x, args)
        if weights is not None:
            sw = jnp.sqrt(jnp.ravel(weights).astype(dtype))
            r = r * sw
            J = J * sw[:, None]
        return r, J

    def cost_of(r):
        return 0.5 * jnp.sum(r * r)

    r0, J0 = lin(x0)
    state = dict(
        x=x0, r=r0, J=J0, cost=cost_of(r0),
        lam=jnp.asarray(lambda_init, dtype), nu=jnp.asarray(2.0, dtype),
        it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool),
        gnorm=jnp.asarray(jnp.inf, dtype),
    )

    def cond(s):
        return (~s["done"]) & (s["it"] < max_iters)

    def body(s):
        H = ata(s["J"])
        g = atb(s["J"], s["r"])
        gnorm = jnp.max(jnp.abs(g))
        delta, bad = solve_damped_normal(H, g, s["lam"], use_marquardt_scaling)
        x_try = manifold.retract(s["x"], delta)
        r_try = jnp.ravel(residual_fn(x_try, *args))
        if weights is not None:
            r_try = r_try * jnp.sqrt(jnp.ravel(weights).astype(dtype))
        cost_try = cost_of(r_try)

        if use_marquardt_scaling:
            D = jnp.maximum(jnp.diagonal(H), jnp.asarray(1e-12, dtype))
        else:
            D = jnp.ones_like(jnp.diagonal(H))
        pred = 0.5 * jnp.dot(delta, s["lam"] * D * delta - g)
        rho = (s["cost"] - cost_try) / jnp.maximum(pred, jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30, dtype))
        accept = (cost_try < s["cost"]) & jnp.isfinite(cost_try) & (~bad)

        lam_acc = s["lam"] * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_rej = s["lam"] * s["nu"]
        lam_new = jnp.where(accept, lam_acc, lam_rej)
        nu_new = jnp.where(accept, 2.0, s["nu"] * 2.0)

        # recompute linearization only on accept
        r_new, J_new = jax.lax.cond(accept, lambda: lin(x_try), lambda: (s["r"], s["J"]))
        x_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), x_try, s["x"])
        cost_new = jnp.where(accept, cost_try, s["cost"])

        if callback is not None:
            jax.debug.callback(callback, s["it"], cost_new, lam_new)

        small_step = accept & (jnp.sum(delta * delta) < xtol * xtol)
        small_grad = gnorm < gtol
        small_decrease = accept & (s["cost"] - cost_try < ftol * s["cost"]) if ftol > 0 else jnp.zeros((), bool)
        done = small_step | small_grad | small_decrease | bad

        return dict(x=x_new, r=r_new, J=J_new, cost=cost_new, lam=lam_new,
                    nu=nu_new, it=s["it"] + 1, done=done, gnorm=gnorm)

    s = jax.lax.while_loop(cond, body, state)
    return SolveResult(x=s["x"], cost=s["cost"], iterations=s["it"],
                       converged=s["done"], grad_norm=s["gnorm"])

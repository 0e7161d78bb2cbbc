"""SE(3) pose-graph optimization: LM over relative-pose factors.

The BASELINE "pose-graph optimization" config (no reference implementation
exists — st20's g2o usage is BA-only; this is the standard g2o/Ceres pose-graph
problem built on this framework's primitives).

Design: per-edge residual r = log(Z^-1 Ti^-1 Tj) with Jacobians from jacfwd
through the retraction (6x6 per endpoint, vmapped over edges); normal equations
assembled by scatter-add into an (N,N,6,6) block tensor (graphs here are small
enough that the dense reduced system is exact and MXU-friendly); on-device LM
trust region identical to the BA solver's.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tricks_tpu.manifolds import se3
from slam_tricks_tpu.residuals.posegraph import relative_se3_residual
from slam_tricks_tpu.solvers.common import HIGHEST


class PoseGraphState(NamedTuple):
    poses: se3.SE3
    cost: jnp.ndarray
    lam: jnp.ndarray
    nu: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray


def _edge_linearize(poses, i_idx, j_idx, Z, sqrt_info):
    """Per-edge residual + Jacobians wrt tangent perturbations of Ti, Tj.
    Returns (r (E,6), Ji (E,6,6), Jj (E,6,6))."""
    Ti = jax.tree_util.tree_map(lambda a: a[i_idx], poses)
    Tj = jax.tree_util.tree_map(lambda a: a[j_idx], poses)

    def one(Ti_, Tj_, Z_, L_):
        def r_of(di, dj):
            return L_ @ relative_se3_residual(
                se3.retract(Ti_, di), se3.retract(Tj_, dj), Z_)

        z6 = jnp.zeros(6, dtype=Ti_.t.dtype)
        r0 = r_of(z6, z6)
        Ji = jax.jacfwd(r_of, argnums=0)(z6, z6)
        Jj = jax.jacfwd(r_of, argnums=1)(z6, z6)
        return r0, Ji, Jj

    return jax.vmap(one)(Ti, Tj, Z, sqrt_info)


def _pg_cost(poses, i_idx, j_idx, Z, sqrt_info):
    Ti = jax.tree_util.tree_map(lambda a: a[i_idx], poses)
    Tj = jax.tree_util.tree_map(lambda a: a[j_idx], poses)
    r = jax.vmap(lambda a, b, z, L: L @ relative_se3_residual(a, b, z))(
        Ti, Tj, Z, sqrt_info)
    return 0.5 * jnp.sum(r * r)


def solve_pose_graph(poses0, i_idx, j_idx, Z, sqrt_info=None, *, fixed_mask=None,
                     max_iters=50, lambda_init=1e-6, xtol=1e-12):
    """LM pose-graph solve. poses0: stacked SE3 (N,); edges (E,) index arrays
    with measurements Z (stacked SE3 (E,)) and optional (E,6,6) sqrt-information.
    Returns PoseGraphState."""
    N = poses0.t.shape[0]
    E = i_idx.shape[0]
    dtype = poses0.t.dtype
    if sqrt_info is None:
        sqrt_info = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (E, 6, 6))
    if fixed_mask is None:
        fixed_mask = jnp.zeros(N, bool).at[0].set(True)

    cost0 = _pg_cost(poses0, i_idx, j_idx, Z, sqrt_info)
    state = PoseGraphState(poses=poses0, cost=cost0,
                           lam=jnp.asarray(lambda_init, dtype),
                           nu=jnp.asarray(2.0, dtype),
                           it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool))

    def cond(s):
        return (~s.done) & (s.it < max_iters)

    def body(s):
        r, Ji, Jj = _edge_linearize(s.poses, i_idx, j_idx, Z, sqrt_info)
        ee = lambda a, b: jnp.einsum("eri,erj->eij", a, b, precision=HIGHEST)
        ev = lambda a: jnp.einsum("eri,er->ei", a, r, precision=HIGHEST)
        H = jnp.zeros((N, N, 6, 6), dtype=dtype)
        H = H.at[i_idx, i_idx].add(ee(Ji, Ji))
        H = H.at[j_idx, j_idx].add(ee(Jj, Jj))
        H = H.at[i_idx, j_idx].add(ee(Ji, Jj))
        H = H.at[j_idx, i_idx].add(ee(Jj, Ji))
        g = jnp.zeros((N, 6), dtype=dtype)
        g = g.at[i_idx].add(ev(Ji))
        g = g.at[j_idx].add(ev(Jj))

        # Marquardt damping on diagonal blocks
        diag = jnp.arange(N)
        Hd = H[diag, diag]
        d = jnp.maximum(jnp.diagonal(Hd, axis1=-2, axis2=-1), 1e-12)
        H = H.at[diag, diag].add(s.lam * jax.vmap(jnp.diag)(d))

        # gauge masking
        free = (~fixed_mask).astype(dtype)
        H = H * free[:, None, None, None] * free[None, :, None, None]
        H = H.at[diag, diag].add(
            jnp.eye(6, dtype=dtype)[None] * fixed_mask.astype(dtype)[:, None, None])
        g = g * free[:, None]

        A = H.transpose(0, 2, 1, 3).reshape(N * 6, N * 6)
        delta = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(A, lower=True), -g.reshape(N * 6))
        bad = jnp.any(~jnp.isfinite(delta))
        delta = jnp.where(bad, jnp.zeros_like(delta), delta).reshape(N, 6)

        poses_try = jax.vmap(se3.retract)(s.poses, delta)
        cost_try = _pg_cost(poses_try, i_idx, j_idx, Z, sqrt_info)
        dvec = delta.reshape(-1)
        # model decrease for (H + lam D) delta = -g: 0.5 * delta^T (lam D delta - g)
        pred = 0.5 * jnp.dot(
            dvec, s.lam * jnp.maximum(jnp.diagonal(A), 1e-12) * dvec - g.reshape(-1))
        rho = (s.cost - cost_try) / jnp.maximum(pred, 1e-30)

        accept = (cost_try < s.cost) & jnp.isfinite(cost_try) & (~bad)
        lam_new = jnp.where(
            accept, s.lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
            s.lam * s.nu)
        nu_new = jnp.where(accept, 2.0, s.nu * 2.0)
        sel = lambda a, b: jnp.where(accept, a, b)
        return PoseGraphState(
            poses=jax.tree_util.tree_map(sel, poses_try, s.poses),
            cost=sel(cost_try, s.cost),
            lam=jnp.clip(lam_new, 1e-14, 1e10), nu=nu_new, it=s.it + 1,
            done=(accept & (jnp.sum(dvec * dvec) < xtol * xtol)) | bad)

    return jax.lax.while_loop(cond, body, state)

"""Matrix-free preconditioned conjugate gradients on the Schur reduced camera
system — the scalable BA path (SURVEY §7 step 5 "PCG with block-Jacobi
preconditioner for larger pose counts").

The reduced system S x = b with S = Hpp_d - W Hll_d^-1 W^T is never formed:
one S-matvec costs three segment operations over the observation arrays,

    t_l  = sum_{obs of l} W_obs^T x[cam(obs)]        (gather + segment_sum)
    u_l  = Hll_d^-1 t_l                              (batched 3x3)
    y_c  = Hpp_d x_c - sum_{obs of c} W_obs u[lm(obs)]

so memory is O(N * 18) for the per-observation W blocks — no dense (C,L)
tensor — and every step is gather/scatter + VPU math. Preconditioner:
block-Jacobi with the damped per-camera 6x6 blocks (unrolled Cholesky).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tricks_tpu.ops.smallchol import cho_solve_small
from slam_tricks_tpu.solvers.common import HIGHEST
from slam_tricks_tpu.solvers.schur import _inv3x3


def make_schur_matvec(Hpp_d, Hll_inv, W_obs, cam_idx, lm_idx, n_points):
    """Returns matvec(x (C,6)) -> (C,6) computing S x matrix-free."""

    def matvec(x):
        xc = x[cam_idx]                                              # (N,6)
        t = jnp.einsum("nij,ni->nj", W_obs, xc, precision=HIGHEST)   # (N,3)
        t = jax.ops.segment_sum(t, lm_idx, n_points)                 # (L,3)
        u = jnp.einsum("lij,lj->li", Hll_inv, t, precision=HIGHEST)  # (L,3)
        un = u[lm_idx]                                               # (N,3)
        y = jnp.einsum("nij,nj->ni", W_obs, un, precision=HIGHEST)   # (N,6)
        y = jax.ops.segment_sum(y, cam_idx, Hpp_d.shape[0])          # (C,6)
        return jnp.einsum("cij,cj->ci", Hpp_d, x, precision=HIGHEST) - y

    return matvec


def pcg(matvec, b, precond, *, iters=100, tol=1e-10):
    """Standard PCG with fixed max iterations + residual-norm early stop.
    b, x: (C,6) block vectors. precond(r) applies M^-1."""

    class CG(NamedTuple):
        x: jnp.ndarray
        r: jnp.ndarray
        z: jnp.ndarray
        p: jnp.ndarray
        rz: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray

    b_norm = jnp.sqrt(jnp.sum(b * b))
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    state = CG(x=x0, r=r0, z=z0, p=z0, rz=jnp.sum(r0 * z0),
               it=jnp.zeros((), jnp.int32), done=b_norm < tol)

    def cond(s):
        return (~s.done) & (s.it < iters)

    def body(s):
        Ap = matvec(s.p)
        pAp = jnp.sum(s.p * Ap)
        alpha = s.rz / jnp.maximum(pAp, 1e-30)
        x = s.x + alpha * s.p
        r = s.r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(s.rz, 1e-30)
        p = z + beta * s.p
        done = jnp.sqrt(jnp.sum(r * r)) < tol * jnp.maximum(b_norm, 1e-30)
        return CG(x=x, r=r, z=z, p=p, rz=rz_new, it=s.it + 1, done=done)

    out = jax.lax.while_loop(cond, body, state)
    return out.x, out.it


def solve_rcs_pcg(Hpp, Hll, gp, gl, W_obs, cam_idx, lm_idx, lam, fixed_mask,
                  n_points, *, cg_iters=100, cg_tol=1e-8):
    """Drop-in replacement for the dense Schur reduction: solve the reduced
    camera system with PCG and back-substitute landmarks.

    Returns (delta_pose (C,6), delta_point (L,3))."""
    dtype = gp.dtype
    C = gp.shape[0]

    def damp(H):
        d = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12)
        return H + lam * jax.vmap(jnp.diag)(d)

    Hpp_d = damp(Hpp)
    Hll_d = damp(Hll)
    Hll_inv = _inv3x3(Hll_d)

    # rhs: b = -(gp - W Hll^-1 gl), with gauge rows zeroed
    u = jnp.einsum("lij,lj->li", Hll_inv, gl, precision=HIGHEST)
    y = jnp.einsum("nij,nj->ni", W_obs, u[lm_idx], precision=HIGHEST)
    y = jax.ops.segment_sum(y, cam_idx, C)
    b = -(gp - y)
    free = (~fixed_mask).astype(dtype)
    b = b * free[:, None]

    base_matvec = make_schur_matvec(Hpp_d, Hll_inv, W_obs, cam_idx, lm_idx, n_points)

    def matvec(x):
        # gauge projection: act on free cameras only, identity on fixed
        xf = x * free[:, None]
        y = base_matvec(xf) * free[:, None]
        return y + x * fixed_mask.astype(dtype)[:, None]

    # block-Jacobi preconditioner from the damped pose blocks
    eye6 = jnp.eye(6, dtype=dtype)
    M = Hpp_d * free[:, None, None] + eye6[None] * fixed_mask.astype(dtype)[:, None, None]

    def precond(r):
        return cho_solve_small(M, r)

    dp, n_iters = pcg(matvec, b, precond, iters=cg_iters, tol=cg_tol)

    # back-substitution
    t = jnp.einsum("nij,ni->nj", W_obs, dp[cam_idx], precision=HIGHEST)
    t = jax.ops.segment_sum(t, lm_idx, n_points)
    dl = jnp.einsum("lij,lj->li", Hll_inv, -gl - t, precision=HIGHEST)
    return dp, dl

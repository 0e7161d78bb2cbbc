"""Posterior covariance extraction after a BA solve — the Ceres `Covariance`
class role (no reference implementation; required for a complete framework).

Pose marginal covariances come from the inverse of the gauge-fixed reduced
camera system S (the landmark blocks are already marginalized out — exactly
the quantity the Schur solver forms). Landmark marginals follow from the
standard back-substitution identity

    Cov(l) = Hll^-1 + Hll^-1 W^T  S^-1  W Hll^-1   (restricted to landmark l).
"""

import jax
import jax.numpy as jnp

from slam_tricks_tpu.solvers import schur
from slam_tricks_tpu.solvers.common import HIGHEST


def ba_covariances(poses, points, obs, fixed_mask, *, lam=0.0,
                   compute_landmarks=False):
    """Marginal covariances at the solution.

    Returns (pose_cov (C,6,6), point_cov (L,3,3) or None). Fixed cameras get
    zero covariance. `lam` adds Marquardt damping (0 = pure Gauss-Newton
    covariance; use a small value if S is near-singular)."""
    C = poses.t.shape[0]
    L = points.shape[0]
    dtype = points.dtype
    cam_idx, lm_idx, uv, weight = obs.cam_idx, obs.lm_idx, obs.uv, obs.weight

    r, Jp, Jl = schur._linearize_obs(poses, points, cam_idx, lm_idx, uv, weight)
    Hpp, Hll, gp, gl, W_obs = schur._assemble(r, Jp, Jl, cam_idx, lm_idx, C, L)

    lam = jnp.asarray(lam, dtype)

    def damp(H):
        d = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12)
        return H + lam * jax.vmap(jnp.diag)(d)

    Hpp_d = damp(Hpp)
    Hll_d = damp(Hll)
    # landmarks with no (weighted) observations: identity block so the inverse
    # stays finite (their W column is zero — no contribution either way)
    no_obs = jnp.einsum("lii->l", Hll) <= 0.0
    Hll_d = jnp.where(no_obs[:, None, None], jnp.eye(3, dtype=dtype)[None], Hll_d)
    Hll_inv = schur._inv3x3(Hll_d)

    W = jnp.zeros((C, L, 6, 3), dtype=dtype).at[cam_idx, lm_idx].add(W_obs)
    WHinv = jnp.einsum("clij,ljk->clik", W, Hll_inv, precision=HIGHEST)
    S = -jnp.einsum("clik,elmk->ciem", WHinv, W, precision=HIGHEST)
    eye_c = jnp.eye(C, dtype=dtype)[:, None, :, None]
    S = S + eye_c * Hpp_d[:, :, None, :]
    free = (~fixed_mask).astype(dtype)
    S = S * free[:, None, None, None] * free[None, None, :, None]
    S = S + eye_c * (fixed_mask.astype(dtype)[:, None, None, None]
                     * jnp.eye(6, dtype=dtype)[None, :, None, :])

    S_mat = S.reshape(C * 6, C * 6)
    S_inv4 = jnp.linalg.inv(S_mat).reshape(C, 6, C, 6)
    pose_cov = jax.vmap(lambda c: S_inv4[c, :, c, :])(jnp.arange(C))
    pose_cov = pose_cov * free[:, None, None]  # fixed cameras: zero

    if not compute_landmarks:
        return pose_cov, None

    # Cov(l) = Hll_inv_l + sum_{c,e} (Hll^-1 W_cl^T) Sinv[c,e] (Hll^-1 W_el^T)^T
    # (fixed cameras contribute nothing: their gauge rows of S were replaced
    # by identity, so Sinv carries spurious 1-blocks there — mask them out)
    HW = jnp.einsum("lik,cljk->clij", Hll_inv, W, precision=HIGHEST)  # (C,L,3,6)
    HW = HW * free[:, None, None, None]
    point_cov = Hll_inv + jnp.einsum(
        "clij,cjem,elkm->lik", HW, S_inv4, HW, precision=HIGHEST)
    return pose_cov, point_cov

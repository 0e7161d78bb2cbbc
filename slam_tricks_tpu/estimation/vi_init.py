"""Closed-form visual-inertial initialization: metric scale, gravity and
keyframe velocities from an up-to-scale visual trajectory + preintegrated IMU.

A monocular pipeline (e.g. pipelines/two_view + BA) yields keyframe poses
with correct rotations but arbitrary translation scale, and no velocities or
gravity direction. The preintegration constraints

    R_k^T (v_{k+1} - v_k - g Dt_k)                       = dv_k
    R_k^T (s p_{k+1} - s p_k - v_k Dt_k - 1/2 g Dt_k^2)  = dp_k

are LINEAR in the unknowns x = [s, g(3), v_0..v_{K-1}] — one dense least
squares solve (6(K-1) equations, 3K+4 unknowns) bootstraps the whole VI
stack; `solve_vi_smoother`/`solve_vi_ba` then refine with biases. This is
the standard mono-VI bootstrap (the reference has no inertial code at all;
its closest artifact is the preintegration theory in
st23-lie-group-v2/doc.tex:132-1148).

Optionally the gravity-norm prior |g| = 9.81 is enforced by a final
2-DoF re-parameterization step (gravity refinement on its tangent plane).

Everything is one jittable dense solve — no per-segment Python.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ViInit(NamedTuple):
    scale: jnp.ndarray     # ()
    gravity: jnp.ndarray   # (3,) world frame
    vels: jnp.ndarray      # (K,3) world frame
    residual: jnp.ndarray  # () rms of the linear system at the solution


def _build_system(pre_batch, poses_visual):
    """Rows: per segment k the dv (3) and dp (3) equations."""
    K = poses_visual.t.shape[0]
    dtype = poses_visual.t.dtype
    n_x = 4 + 3 * K

    # one-hot selection of the v_k / v_{k+1} column blocks keeps the whole
    # build vmappable (no dynamic slices at traced offsets)
    def seg_rows_onehot(k):
        pre_k = jax.tree.map(lambda a: a[k], pre_batch)
        RkT = poses_visual.R[k].T
        Dt = pre_k.dt
        dp_vis = poses_visual.t[k + 1] - poses_visual.t[k]
        ek = jax.nn.one_hot(k, K, dtype=dtype)        # selects v_k
        ek1 = jax.nn.one_hot(k + 1, K, dtype=dtype)   # selects v_{k+1}
        # velocity block layout: (3, K, 3) -> (3, 3K)
        Vv = (-RkT[:, None, :] * ek[None, :, None]
              + RkT[:, None, :] * ek1[None, :, None]).reshape(3, 3 * K)
        Av = jnp.concatenate([jnp.zeros((3, 1), dtype), -RkT * Dt, Vv], 1)
        Vp = (-RkT[:, None, :] * Dt * ek[None, :, None]).reshape(3, 3 * K)
        Ap = jnp.concatenate([(RkT @ dp_vis)[:, None],
                              -0.5 * RkT * Dt * Dt, Vp], 1)
        return (jnp.concatenate([Av, Ap]),
                jnp.concatenate([pre_k.dv, pre_k.dp]))

    A, b = jax.vmap(seg_rows_onehot)(jnp.arange(K - 1))
    return A.reshape(-1, n_x), b.reshape(-1)


def vi_initialize(pre_batch, poses_visual, gravity_norm=9.81,
                  refine_gravity=True):
    """Recover (scale, gravity, velocities) from K up-to-scale visual poses
    and K-1 preintegrated segments (integrated at zero/any fixed bias —
    bias refinement is the smoother's job downstream).

    poses_visual: batched SE3 with METRIC rotations and translations off by
    one global scale factor. Returns ViInit; apply with
    `t_metric = init.scale * poses_visual.t`."""
    K = poses_visual.t.shape[0]
    if K < 4:
        # 6(K-1) equations vs 3K+4 unknowns: determined only for K >= 4
        # (at K=3 lstsq silently returns a wrong minimum-norm solution)
        raise ValueError(f"vi_initialize needs >= 4 keyframes, got K={K} "
                         "(scale+gravity+velocities underdetermined: "
                         f"{6*(K-1)} equations, {3*K+4} unknowns)")
    A, b = _build_system(pre_batch, poses_visual)
    x, *_ = jnp.linalg.lstsq(A, b)
    s, g, v = x[0], x[1:4], x[4:].reshape(-1, 3)

    if refine_gravity:
        # re-solve with |g| fixed: g = gn * (ghat + B dxy), B spans the
        # tangent plane of the sphere at ghat (2 DoF) — one more lstsq on
        # the reduced unknowns [s, dxy, v].
        dtype = b.dtype
        gn = jnp.asarray(gravity_norm, dtype)
        ghat = g / jnp.maximum(jnp.linalg.norm(g), 1e-12)
        # orthonormal tangent basis at ghat
        ref = jnp.where(jnp.abs(ghat[0]) < 0.9,
                        jnp.array([1.0, 0.0, 0.0], dtype),
                        jnp.array([0.0, 1.0, 0.0], dtype))
        b1 = jnp.cross(ghat, ref)
        b1 = b1 / jnp.linalg.norm(b1)
        b2 = jnp.cross(ghat, b1)
        B = jnp.stack([b1, b2], axis=1)             # (3,2)
        Ag = A[:, 1:4]
        A_red = jnp.concatenate([A[:, :1], Ag @ B, A[:, 4:]], axis=1)
        b_red = b - Ag @ (gn * ghat)
        x2, *_ = jnp.linalg.lstsq(A_red, b_red)
        s = x2[0]
        g = gn * ghat + B @ x2[1:3]
        # project back to the sphere (the tangent step can leave it slightly)
        g = gn * g / jnp.maximum(jnp.linalg.norm(g), 1e-12)
        v = x2[3:].reshape(-1, 3)

    res = jnp.sqrt(jnp.mean((A @ jnp.concatenate(
        [s[None], g, v.reshape(-1)]) - b) ** 2))
    return ViInit(scale=s, gravity=g, vels=v, residual=res)

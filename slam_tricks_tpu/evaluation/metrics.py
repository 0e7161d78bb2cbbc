"""Evaluation metrics: ATE, trajectory alignment, reprojection statistics.

Reference: ATE RMSE of SE(3) log-residuals (st4-kalman/src/src/pose_simulation.cpp:198-209),
3-point rotation alignment (:172-196 — generalized here to full Umeyama/Horn),
reprojection mean/sigma statistics (st2-epipolar/src/main.cpp:127-151).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tricks_tpu.manifolds import se3
from slam_tricks_tpu.residuals.icp import umeyama


class ErrorStats(NamedTuple):
    mean: jnp.ndarray
    sigma: jnp.ndarray
    rmse: jnp.ndarray
    max: jnp.ndarray


def stats(errors):
    """Summary statistics of a flat error array (st2 main.cpp:127-151 style)."""
    e = jnp.ravel(errors)
    mean = jnp.mean(e)
    sigma = jnp.std(e)
    return ErrorStats(mean=mean, sigma=sigma,
                      rmse=jnp.sqrt(jnp.mean(e * e)), max=jnp.max(jnp.abs(e)))


def ate_rmse(poses_est, poses_ref):
    """Absolute trajectory error: RMSE of ||log(T_ref^-1 T_est)||
    (pose_simulation.cpp:198-209). Stacked SE3 inputs (leading axis = time)."""
    xi = jax.vmap(lambda a, b: se3.log(se3.mul(se3.inv(b), a)))(poses_est, poses_ref)
    return jnp.sqrt(jnp.mean(jnp.sum(xi * xi, axis=1)))


def ate_translation_rmse(poses_est, poses_ref):
    d = poses_est.t - poses_ref.t
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=1)))


def align_trajectories(poses_est, poses_ref, with_scale=True):
    """Find the similarity (Sim3) aligning estimated camera centers onto the
    reference before ATE — the generalization of the reference's 3-point
    rotation alignment (pose_simulation.cpp:172-196). Returns aligned poses.

    Camera center of T_cw: c = -R^T t. Alignment maps centers; rotations are
    adjusted by the same global rotation."""
    c_est = -jnp.einsum("nij,ni->nj", poses_est.R, poses_est.t)
    c_ref = -jnp.einsum("nij,ni->nj", poses_ref.R, poses_ref.t)
    R, t, s = umeyama(c_est, c_ref, with_scale=with_scale)
    # world-frame similarity g(x) = s R x + t applied to T_cw:
    # new camera center c' = s R c + t; new R_cw' = R_cw R^T
    new_R = jnp.einsum("nij,kj->nik", poses_est.R, R)
    new_c = s * jnp.einsum("ij,nj->ni", R, c_est) + t
    new_t = -jnp.einsum("nij,nj->ni", new_R, new_c)
    return se3.SE3(new_R, new_t)


def reprojection_rms(poses, points, cam_idx, lm_idx, uv, weight):
    """Weighted RMS of normalized-plane reprojection residuals."""
    T = jax.tree_util.tree_map(lambda a: a[cam_idx], poses)
    p = points[lm_idx]

    def one(Ti, pi, uvi):
        pc = Ti.R @ pi + Ti.t
        return pc[:2] / pc[2] - uvi

    r = jax.vmap(one)(T, p, uv)
    wsum = jnp.maximum(jnp.sum(weight), 1.0)
    return jnp.sqrt(jnp.sum(weight[:, None] * r * r) / (2.0 * wsum))

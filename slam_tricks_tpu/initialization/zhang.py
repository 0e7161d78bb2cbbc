"""Zhang closed-form camera calibration: intrinsics from homography B-matrix
constraints + per-view extrinsics.

Reference: st3-calibration/src/src/calib.cpp — per-view DLT homographies
(:55-93), intrinsics via the two constraints per view on B = K^-T K^-1 solved by
SVD null-space with closed-form recovery (:95-140), extrinsics with SVD rotation
projection (:142-173). Feeds the joint LM refinement (residuals/calib.py).
"""

import jax
import jax.numpy as jnp

from slam_tricks_tpu.initialization.homography import homography_dlt
from slam_tricks_tpu.manifolds import se3, so3
from slam_tricks_tpu.residuals.camera import Intrinsics


def _v_ij(H, i, j):
    """Zhang constraint row v_ij from homography columns (calib.cpp:103-118)."""
    hi, hj = H[:, i], H[:, j]
    return jnp.stack([
        hi[0] * hj[0],
        hi[0] * hj[1] + hi[1] * hj[0],
        hi[1] * hj[1],
        hi[2] * hj[0] + hi[0] * hj[2],
        hi[2] * hj[1] + hi[1] * hj[2],
        hi[2] * hj[2],
    ])


def intrinsics_from_homographies(Hs):
    """Hs (V,3,3) -> (Intrinsics, skew). Needs V >= 3 views (or 2 with zero-skew
    assumption; we always solve the 6-parameter B)."""
    rows = []
    for k in range(Hs.shape[0]):
        H = Hs[k]
        rows.append(_v_ij(H, 0, 1))
        rows.append(_v_ij(H, 0, 0) - _v_ij(H, 1, 1))
    A = jnp.stack(rows)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    b = Vt[-1]
    B11, B12, B22, B13, B23, B33 = b[0], b[1], b[2], b[3], b[4], b[5]
    # closed-form recovery (Zhang eq. (13)-ff; calib.cpp:120-140)
    v0 = (B12 * B13 - B11 * B23) / (B11 * B22 - B12 * B12)
    lam = B33 - (B13 * B13 + v0 * (B12 * B13 - B11 * B23)) / B11
    alpha = jnp.sqrt(jnp.abs(lam / B11))
    beta = jnp.sqrt(jnp.abs(lam * B11 / (B11 * B22 - B12 * B12)))
    gamma = -B12 * alpha * alpha * beta / lam
    u0 = gamma * v0 / beta - B13 * alpha * alpha / lam
    return Intrinsics(alpha, beta, u0, v0), gamma


def extrinsics_from_homography(K, H):
    """Per-view T_cw from H = K [r1 r2 t] (calib.cpp:142-173): scale by
    1/||K^-1 h1||, r3 = r1 x r2, SVD-project to SO(3)."""
    Kinv_H = jnp.linalg.solve(K, H)
    h1, h2, h3 = Kinv_H[:, 0], Kinv_H[:, 1], Kinv_H[:, 2]
    s = 1.0 / jnp.linalg.norm(h1)
    # sign: board must be in front of the camera (positive z translation)
    s = s * jnp.sign(h3[2])
    r1, r2, t = s * h1, s * h2, s * h3
    R = so3.project(jnp.stack([r1, r2, jnp.cross(r1, r2)], axis=1))
    return se3.SE3(R, t)


def calibrate_closed_form(board_pts, image_pts):
    """Full Zhang init: board_pts (P,2) model-plane corners, image_pts (V,P,2)
    per-view pixel corners. Returns (Intrinsics, skew, poses SE3 stacked (V,))."""
    Hs = jax.vmap(lambda uv: homography_dlt(board_pts, uv))(image_pts)
    intr, skew = intrinsics_from_homographies(Hs)
    poses = jax.vmap(lambda H: extrinsics_from_homography(intr.K, H))(Hs)
    return intr, skew, poses

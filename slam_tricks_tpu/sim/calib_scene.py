"""Synthetic Zhang-calibration scene: chessboard grid + random camera views.

Mirrors the reference's real-data setup (st3-calibration: 5x8 board, 2.8 cm
squares, 9 views — main.cpp:4, calib/1.txt headers) but generated with known
ground truth so closed-form init and joint refinement can be validated exactly.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from slam_tricks_tpu.manifolds import se3
from slam_tricks_tpu.residuals.camera import DistCoeffs, Intrinsics


class CalibScene(NamedTuple):
    board_pts: jnp.ndarray   # (P,2) model-plane corners (meters)
    image_pts: jnp.ndarray   # (V,P,2) pixels per view
    poses_true: se3.SE3      # (V,) T_cw
    fx: float
    fy: float
    cx: float
    cy: float
    dist_true: DistCoeffs


def make_calib_scene(rows=5, cols=8, square=0.028, n_views=9, noise=0.0,
                     dist=None, seed=0, dtype=np.float64):
    """Board corners on Z=0 plane; views at varying tilt/distance; optional
    radial-tangential distortion and pixel noise."""
    rng = np.random.default_rng(seed)
    fx, fy, cx, cy = 600.0, 590.0, 320.0, 240.0
    if dist is None:
        dist = DistCoeffs.zeros(jnp.float64 if dtype == np.float64 else jnp.float32)

    ys, xs = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    board = np.stack([xs.ravel(), ys.ravel()], axis=1) * square  # (P,2)
    board_c = board.mean(axis=0)

    Rs, ts, img_pts = [], [], []
    from slam_tricks_tpu.residuals.camera import distort_normalized, Intrinsics as I

    intr = I(jnp.asarray(fx, jnp.float64), jnp.asarray(fy, jnp.float64),
             jnp.asarray(cx, jnp.float64), jnp.asarray(cy, jnp.float64))
    for v in range(n_views):
        # camera looks at board center from a random tilted position
        ang = rng.uniform(-0.5, 0.5, size=3)
        Rz = _euler(ang)
        dist_z = rng.uniform(0.35, 0.7)
        offset = np.array([rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05), dist_z])
        # T_cw: p_cam = R (p_world - center) + offset-ish
        t = offset - Rz @ np.array([board_c[0], board_c[1], 0.0])
        Rs.append(Rz)
        ts.append(t)
        pw = np.concatenate([board, np.zeros((board.shape[0], 1))], axis=1)
        pc = pw @ Rz.T + t
        pn = pc[:, :2] / pc[:, 2:]
        pn_dist = np.stack(
            [np.asarray(distort_normalized(dist, jnp.asarray(p))) for p in pn])
        uv = pn_dist * np.array([fx, fy]) + np.array([cx, cy])
        if noise > 0:
            uv = uv + rng.normal(size=uv.shape) * noise
        img_pts.append(uv)

    poses = se3.SE3(jnp.asarray(np.stack(Rs).astype(dtype)),
                    jnp.asarray(np.stack(ts).astype(dtype)))
    return CalibScene(
        board_pts=jnp.asarray(board.astype(dtype)),
        image_pts=jnp.asarray(np.stack(img_pts).astype(dtype)),
        poses_true=poses, fx=fx, fy=fy, cx=cx, cy=cy, dist_true=dist)


def _euler(ang):
    cx_, sx = np.cos(ang[0]), np.sin(ang[0])
    cy_, sy = np.cos(ang[1]), np.sin(ang[1])
    cz, sz = np.cos(ang[2]), np.sin(ang[2])
    Rx = np.array([[1, 0, 0], [0, cx_, -sx], [0, sx, cx_]])
    Ry = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx

"""Direct (photometric) pose alignment — st13's goal, which the reference left
as a skeleton (st13-directmethod/src/src/direct.cpp:4-16 only rotates image
buffers; increasePixPts is empty). Implemented here for real: sparse direct
SE(3) alignment of two intensity images given depth at sampled pixels.

r_i = I2( pi( T_21 * pi^-1(p_i, d_i) ) ) - I1(p_i)

Gradients flow through the bilinear sampler (differentiable), so the generic
LM solver drives the whole thing — no hand-written image-gradient chain rule.
High-gradient pixel selection is the standard sparse-direct trick.
"""

import jax
import jax.numpy as jnp

from slam_tricks_tpu.manifolds import lie, se3
from slam_tricks_tpu.ops.image import sample_bilinear, sobel
from slam_tricks_tpu.ops.nms import top_k_peaks
from slam_tricks_tpu.residuals.camera import Intrinsics
from slam_tricks_tpu.solvers import levenberg_marquardt


def select_pixels(img, k=512, nms_radius=3, margin=8):
    """High-gradient pixel sites (the increasePixPts role). Returns (k,2) xy
    float coords and a validity mask."""
    gx, gy = sobel(img)
    mag = gx * gx + gy * gy
    H, W = img.shape
    border = jnp.zeros_like(mag)
    border = border.at[margin:H - margin, margin:W - margin].set(1.0)
    scores, rows, cols = top_k_peaks(mag * border, k, nms_radius, 1e-6)
    xy = jnp.stack([cols, rows], axis=1).astype(img.dtype)
    return xy, jnp.isfinite(scores)


def photometric_residual(T_21, img1, img2, xy1, depth1, intr, valid):
    """(k,) intensity residuals; out-of-view / invalid pixels weighted 0 via
    the returned mask multiplication."""
    u = (xy1[:, 0] - intr.cx) / intr.fx
    v = (xy1[:, 1] - intr.cy) / intr.fy
    p1 = jnp.stack([u * depth1, v * depth1, depth1], axis=1)      # (k,3) cam1
    p2 = se3.act(T_21, p1)
    z_ok = p2[:, 2] > 1e-3
    z = jnp.where(z_ok, p2[:, 2], 1.0)
    x2 = intr.fx * p2[:, 0] / z + intr.cx
    y2 = intr.fy * p2[:, 1] / z + intr.cy
    H, W = img2.shape
    inb = (x2 >= 1) & (x2 <= W - 2) & (y2 >= 1) & (y2 <= H - 2) & z_ok & valid
    i2 = sample_bilinear(img2, jnp.stack([x2, y2], axis=1))
    i1 = sample_bilinear(img1, xy1)
    return jnp.where(inb, i2 - i1, 0.0)


def direct_pose_estimate(img1, img2, depth1_at, intr, T_init=None, k=512,
                         max_iters=30):
    """Estimate T_21 (cam2-from-cam1) photometrically.

    depth1_at: (k,) depths for the selected pixels (callers with a dense depth
    map can sample it at `select_pixels` sites). Returns (T_21, SolveResult)."""
    xy1, valid = select_pixels(img1, k=k)
    if T_init is None:
        T_init = se3.identity(img1.dtype)
    if callable(depth1_at):
        depth1 = depth1_at(xy1)
    else:
        depth1 = depth1_at

    def resid(T):
        return photometric_residual(T, img1, img2, xy1, depth1, intr, valid)

    res = levenberg_marquardt(resid, T_init, lie(se3), max_iters=max_iters,
                              lambda_init=1e-3)
    return res.x, res

"""Zhang-calibration joint-refinement residual: full projection chain
pixel = K * distort( normalize( T_cw * [X, Y, 0] ) ).

Parameters: 4 intrinsics + 5 distortion + per-view SE(3) pose — the 9+6N joint
refinement of the reference (st3-calibration/src/src/calib.cpp:282-422, chain
rule J_intri/J_dist/J_pos at :334-390). Here the Jacobian comes from jacfwd
through the manifold retraction; accuracy is cross-validated against the
closed-form chain in tests.
"""

import jax.numpy as jnp

from slam_tricks_tpu.manifolds import se3
from slam_tricks_tpu.residuals import camera


def calib_residual(intr, dist, T_cw, board_point, pixel):
    """(2,) pixel residual for one corner of one view.

    board_point: (2,) chessboard-plane coordinates (Z=0 model plane,
    calib.cpp:31-35); pixel: (2,) measured corner.
    """
    p_world = jnp.concatenate([board_point, jnp.zeros((1,), dtype=board_point.dtype)])
    p_cam = se3.act(T_cw, p_world)
    p_norm = p_cam[:2] / p_cam[2]
    p_dist = camera.distort_normalized(dist, p_norm)
    return camera.project(intr, p_dist) - pixel


def pack_intrinsics(intr, dist):
    """Flatten (intr, dist) to the 9-vector [fx, fy, cx, cy, k1, k2, k3, p1, p2]."""
    return jnp.stack([intr.fx, intr.fy, intr.cx, intr.cy,
                      dist.k1, dist.k2, dist.k3, dist.p1, dist.p2])


def unpack_intrinsics(v):
    return (camera.Intrinsics(v[0], v[1], v[2], v[3]),
            camera.DistCoeffs(v[4], v[5], v[6], v[7], v[8]))

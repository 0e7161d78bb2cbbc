"""SE(3) pose-graph (relative-pose) residual.

The BASELINE "pose-graph optimization" config. No direct reference
implementation exists (the reference's g2o usage is BA-only,
st20-g2o/src/include/test_g2o.h), so this is the standard right-perturbation
relative-SE3 factor: given measurement Z_ij ~ T_i^-1 T_j,

    r = log( Z_ij^-1 * T_i^-1 * T_j )   in R^6.
"""

import jax.numpy as jnp

from slam_tricks_tpu.manifolds import se3


def relative_se3_residual(T_i, T_j, Z_ij):
    """(6,) log-residual of the relative-pose factor."""
    return se3.log(se3.mul(se3.inv(Z_ij), se3.mul(se3.inv(T_i), T_j)))


def relative_se3_residual_weighted(T_i, T_j, Z_ij, sqrt_info):
    """Whitened by a (6,6) square-root information matrix."""
    return sqrt_info @ relative_se3_residual(T_i, T_j, Z_ij)


def relative_sim3_residual(S_i, S_j, Z_ij):
    """(7,) log-residual of the relative-similarity factor: the scale-drift-
    aware mono loop-closing factor (Strasdat et al., RSS 2010) —
    r = log( Z_ij^-1 * S_i^-1 * S_j ) in R^7 = [rho, omega, sigma]."""
    from slam_tricks_tpu.manifolds import sim3
    return sim3.log(sim3.mul(sim3.inv(Z_ij), sim3.mul(sim3.inv(S_i), S_j)))

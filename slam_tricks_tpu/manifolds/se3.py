"""SE(3) — rigid transforms, stored as a pytree pair (R: 3x3, t: 3).

The pair form (not a 4x4 matrix) keeps the tangent/storage layout explicit for
sharding and avoids wasted lanes on the constant bottom row. Tangent ordering is
[rho (translation), omega (rotation)] — Sophus convention, matching the
reference's `Sophus::SE3d::exp` usage (st17-ceres/src/include/solver.hpp:43 and
st23-lie-group-v2/doc.tex SE(3) section).

Single-element functions; batch with `jax.vmap`.
"""

from typing import NamedTuple

import jax.numpy as jnp

from slam_tricks_tpu.manifolds import so3

DIM = 6


class SE3(NamedTuple):
    """R: (..., 3, 3) rotation, t: (..., 3) translation."""
    R: jnp.ndarray
    t: jnp.ndarray


def identity(dtype=jnp.float32):
    return SE3(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype))


def exp(xi):
    """xi = [rho, omega] -> SE3(exp(omega), Jl(omega) rho)."""
    rho, w = xi[:3], xi[3:]
    return SE3(so3.exp(w), so3.jl(w) @ rho)


def log(T):
    w = so3.log(T.R)
    rho = so3.jl_inv(w) @ T.t
    return jnp.concatenate([rho, w])


def mul(Ta, Tb):
    return SE3(Ta.R @ Tb.R, Ta.R @ Tb.t + Ta.t)


def inv(T):
    Rt = T.R.T
    return SE3(Rt, -(Rt @ T.t))


def act(T, p):
    """Transform point(s): (3,) or (..., 3)."""
    if p.ndim > 1:
        return p @ T.R.T + T.t
    return T.R @ p + T.t


def adj(T):
    """6x6 adjoint in [rho, omega] ordering: [[R, hat(t) R], [0, R]]."""
    tR = so3.hat(T.t) @ T.R
    Z = jnp.zeros((3, 3), dtype=T.R.dtype)
    return jnp.block([[T.R, tR], [Z, T.R]])


def retract(T, xi):
    """Right perturbation T * exp(xi) (reference update convention,
    st17-ceres/src/include/solver.hpp:442-443)."""
    return mul(T, exp(xi))


def local(Ta, Tb):
    return log(mul(inv(Ta), Tb))


def to_matrix(T):
    bottom = jnp.zeros((1, 4), dtype=T.R.dtype).at[0, 3].set(1.0)
    return jnp.concatenate([jnp.concatenate([T.R, T.t[:, None]], axis=1), bottom])


def from_matrix(M):
    return SE3(M[:3, :3], M[:3, 3])


def random(key, dtype=jnp.float32, trans_scale=1.0):
    import jax
    k1, k2 = jax.random.split(key)
    return SE3(so3.random(k1, dtype), trans_scale * jax.random.normal(k2, (3,), dtype=dtype))

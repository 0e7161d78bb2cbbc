"""SE(2) — planar rigid transforms as a pytree pair (theta scalar, t: 2).

Tangent ordering [rho (2), omega (1)], Sophus convention; used by the SE(2) ICP
problem class (reference: st6-icp/src/include/icp.hpp:27-48) and derived in
st23-lie-group-v2/doc.tex SE(2) section.
"""

from typing import NamedTuple

import jax.numpy as jnp

from slam_tricks_tpu.manifolds import _coeffs, so2

DIM = 3


class SE2(NamedTuple):
    theta: jnp.ndarray  # scalar angle
    t: jnp.ndarray      # (2,)


def identity(dtype=jnp.float32):
    return SE2(jnp.zeros((), dtype=dtype), jnp.zeros(2, dtype=dtype))


def _V(w):
    """SE(2) translation map V(w) = [[A, -B*w],[B*w, A]] / ... precisely:
    t = V(w) rho with V = [[sin w / w, -(1-cos w)/w], [(1-cos w)/w, sin w / w]]."""
    w_sq = w * w
    a = _coeffs.sinc(w_sq)          # sin(w)/w
    b = _coeffs.cosc(w_sq) * w      # (1-cos w)/w
    return jnp.stack([jnp.stack([a, -b]), jnp.stack([b, a])])


def exp(xi):
    rho, w = xi[:2], xi[2]
    return SE2(so2.wrap(w), _V(w) @ rho)


def log(T):
    w = so2.wrap(T.theta)
    rho = jnp.linalg.solve(_V(w), T.t)
    return jnp.concatenate([rho, w[None]])


def mul(Ta, Tb):
    return SE2(so2.mul(Ta.theta, Tb.theta), so2.act(Ta.theta, Tb.t) + Ta.t)


def inv(T):
    return SE2(-T.theta, -so2.act(-T.theta, T.t))


def act(T, p):
    return so2.act(T.theta, p) + T.t


def retract(T, xi):
    return mul(T, exp(xi))


def local(Ta, Tb):
    return log(mul(inv(Ta), Tb))


def matrix(T):
    R = so2.matrix(T.theta)
    top = jnp.concatenate([R, T.t[:, None]], axis=1)
    bottom = jnp.zeros((1, 3), dtype=top.dtype).at[0, 2].set(1.0)
    return jnp.concatenate([top, bottom])

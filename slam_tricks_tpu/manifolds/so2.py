"""SO(2) — planar rotations, stored as a scalar angle theta (exact, minimal).

Reference usage: Sophus::SO2d in the SE(2) ICP (st6-icp/src/include/icp.hpp:63-95).
"""

import jax.numpy as jnp

DIM = 1


def identity(dtype=jnp.float32):
    return jnp.zeros((), dtype=dtype)


def exp(w):
    """Tangent (1,) -> angle scalar."""
    return jnp.reshape(w, ())


def log(theta):
    return jnp.reshape(wrap(theta), (1,))


def wrap(theta):
    """Wrap to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def matrix(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def mul(a, b):
    return wrap(a + b)


def inv(theta):
    return -theta


def act(theta, p):
    R = matrix(theta)
    return p @ R.T if p.ndim > 1 else R @ p


def retract(theta, w):
    return wrap(theta + jnp.reshape(w, ()))


def local(a, b):
    return jnp.reshape(wrap(b - a), (1,))

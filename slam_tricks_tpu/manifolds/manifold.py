"""Generic manifold interface for the solvers — the Ceres LocalParameterization
analog (reference: LieLocalParameterization / LieR3LocalParameterization,
st17-ceres/src/include/solver.hpp:31-94), but functional and static-shape.

A `Manifold` bundles a tangent dimension with a retraction x [+] delta and its
inverse y [-] x. Solvers differentiate residuals through `retract` at delta=0,
which yields Jacobians directly in the tangent space — no explicit "local
parameterization Jacobian" product is ever formed.

Combinators:
- ``euclidean(shape)``          plain vector blocks (delta added)
- ``lie(module)``               any group module exposing retract/local/DIM
- ``product(m1, m2, ...)``      tuple of blocks, tangents concatenated
- ``batched(m, n)``             n independent copies along a leading axis (vmap)
"""

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Manifold:
    dim: int
    retract: Callable[[Any, jnp.ndarray], Any]   # (x, delta[dim]) -> x'
    local: Callable[[Any, Any], jnp.ndarray]     # (x, y) -> delta[dim]


def euclidean(shape):
    shape = tuple(np.atleast_1d(shape)) if not isinstance(shape, tuple) else shape
    size = int(np.prod(shape)) if shape else 1

    def retract(x, d):
        return x + d.reshape(x.shape).astype(x.dtype)

    def local(x, y):
        return (y - x).reshape(size)

    return Manifold(size, retract, local)


def lie(module):
    """Wrap a group module (so2/se2/so3/se3) as a Manifold."""
    return Manifold(module.DIM, module.retract, module.local)


def so3_r3():
    """SO(3) (+) R^3 product block — the g2o VertexCamera oplus convention
    (reference: st20-g2o/src/include/test_g2o.h:36-39): rotation retracts on the
    group, translation adds. Tangent ordering [omega(3), dt(3)] to match the
    reference vertex layout. Operates on an se3.SE3 pair."""
    from slam_tricks_tpu.manifolds import se3, so3

    def retract(T, d):
        return se3.SE3(so3.retract(T.R, d[:3]), T.t + d[3:])

    def local(Ta, Tb):
        return jnp.concatenate([so3.local(Ta.R, Tb.R), Tb.t - Ta.t])

    return Manifold(6, retract, local)


def product(*manifolds):
    dims = [m.dim for m in manifolds]
    offsets = np.concatenate([[0], np.cumsum(dims)]).astype(int)
    total = int(offsets[-1])

    def retract(xs, d):
        return tuple(
            m.retract(x, d[offsets[i]:offsets[i + 1]])
            for i, (m, x) in enumerate(zip(manifolds, xs))
        )

    def local(xs, ys):
        return jnp.concatenate([m.local(x, y) for m, x, y in zip(manifolds, xs, ys)])

    return Manifold(total, retract, local)


def batched(m, n):
    """n independent copies of `m` stacked along a leading axis; tangent is the
    flat concatenation (n * m.dim,)."""
    v_retract = jax.vmap(m.retract)
    v_local = jax.vmap(m.local)

    def retract(x, d):
        return v_retract(x, d.reshape(n, m.dim))

    def local(x, y):
        return v_local(x, y).reshape(n * m.dim)

    return Manifold(n * m.dim, retract, local)

"""Epipolar residuals: algebraic x2'Fx1, point-to-line distances, Sampson error.

Reference: st2-epipolar/src/include/epipolar.hpp — the residual statistics used
for outlier gating and solver comparison (main.cpp:127-151 computes the
point-to-epiline distances both directions).
"""

import jax.numpy as jnp


def _h(p):
    return jnp.concatenate([p, jnp.ones((1,), dtype=p.dtype)])


def algebraic(F, p1, p2):
    """Scalar x2^T F x1."""
    return _h(p2) @ F @ _h(p1)


def epiline_distance(F, p1, p2):
    """Symmetric point-to-epipolar-line distances (2,): d(x2, F x1), d(x1, F^T x2)."""
    l2 = F @ _h(p1)
    l1 = F.T @ _h(p2)
    a = algebraic(F, p1, p2)
    d2 = a / jnp.sqrt(l2[0] ** 2 + l2[1] ** 2)
    d1 = a / jnp.sqrt(l1[0] ** 2 + l1[1] ** 2)
    return jnp.stack([d1, d2])


def sampson(F, p1, p2):
    """First-order geometric (Sampson) error — scalar."""
    x1, x2 = _h(p1), _h(p2)
    Fx1 = F @ x1
    Ftx2 = F.T @ x2
    num = (x2 @ Fx1) ** 2
    den = Fx1[0] ** 2 + Fx1[1] ** 2 + Ftx2[0] ** 2 + Ftx2[1] ** 2
    return num / den

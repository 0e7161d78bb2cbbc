"""Small fit residuals used as solver unit-test fodder and RANSAC demos.

- parabola:   y = a x^2 + b x + c   (reference: st7-ransac/src/include/parabola.hpp:98-130)
- homography: 8-parameter projective warp, h22 fixed to 1
  (reference: st9-projective/src/include/projective.hpp:11-54)
"""

import jax.numpy as jnp


def parabola_residual(params, x, y):
    """params = [a, b, c]; scalar residual per point."""
    a, b, c = params[0], params[1], params[2]
    return (a * x + b) * x + c - y


def parabola_fit_lsq(xs, ys, weights=None):
    """Closed-form weighted normal-equations fit (parabola.hpp:98-108)."""
    A = jnp.stack([xs * xs, xs, jnp.ones_like(xs)], axis=1)
    if weights is not None:
        Aw = A * weights[:, None]
        return jnp.linalg.solve(Aw.T @ A, Aw.T @ ys)
    return jnp.linalg.solve(A.T @ A, A.T @ ys)


def apply_homography(h8, p):
    """h8 = first 8 entries of H (row-major), H[2,2]=1. p: (2,) -> (2,)."""
    H = jnp.concatenate([h8, jnp.ones((1,), dtype=h8.dtype)]).reshape(3, 3)
    q = H @ jnp.concatenate([p, jnp.ones((1,), dtype=p.dtype)])
    return q[:2] / q[2]


def homography_residual(h8, src, dst):
    """(2,) transfer residual for one correspondence (projective.hpp:25-36)."""
    return apply_homography(h8, src) - dst

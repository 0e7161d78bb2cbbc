"""DLT homography estimation (normalized), as used by st9/st11/st3.

Reference: st9-projective svd::projective_svd (projective.hpp:81-109),
st11-panorama own DLT (projective.cpp:5-50), st3 per-view homographies
(calib.cpp:55-93). Hartley-normalized for conditioning; vmappable.
"""

import jax.numpy as jnp

from slam_tricks_tpu.initialization.eightpoint import hartley_normalize


def homography_dlt(src, dst, weights=None):
    """H (3,3) with ||H||=1, H maps src -> dst. src/dst (N,2), N >= 4."""
    n1, T1 = hartley_normalize(src)
    n2, T2 = hartley_normalize(dst)
    x, y = n1[:, 0], n1[:, 1]
    u, v = n2[:, 0], n2[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # two rows per correspondence
    r1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=1)
    r2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)
    if weights is not None:
        w2 = jnp.concatenate([weights, weights])
        A = A * w2[:, None]
    from slam_tricks_tpu.initialization.eightpoint import nullvec_normal
    v, _ = nullvec_normal(A)
    Hn = v.reshape(3, 3)
    H = jnp.linalg.solve(T2, Hn @ T1)
    return H / jnp.where(jnp.abs(H[2, 2]) > 1e-12, H[2, 2], jnp.linalg.norm(H))


def apply_h(H, p):
    """Batched homography application: p (...,2) -> (...,2)."""
    q = p @ H[:2, :2].T + H[:2, 2]
    w = p @ H[2, :2] + H[2, 2]
    return q / w[..., None]

"""Masked degeneracy fallbacks for the SVD init solvers (SURVEY §7 hard part
"SVD differentiability/edge cases"; the reference bails with std::optional,
two_view_geometry.cpp:77-80 / recovery.hpp:128 — here degeneracy surfaces as
finite outputs + ok=False flags, never NaN)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.initialization import eightpoint as ep
from slam_tricks_tpu.manifolds import so3


def test_identical_points_flagged():
    p = jnp.tile(jnp.array([[0.1, 0.2]]), (16, 1))
    F, ok = ep.fundamental_8pt(p, p, return_ok=True)
    assert not bool(ok)
    assert bool(jnp.all(jnp.isfinite(F)))


def test_pure_rotation_flagged():
    rng = np.random.default_rng(0)
    X = rng.uniform([-1, -1, 3], [1, 1, 6], (32, 3))
    R = np.asarray(so3.exp(jnp.array([0.1, 0.05, -0.2])))
    p1 = X[:, :2] / X[:, 2:]
    Xr = X @ R.T
    p2 = Xr[:, :2] / Xr[:, 2:]
    E, ok = ep.essential_8pt(jnp.asarray(p1), jnp.asarray(p2), return_ok=True)
    assert not bool(ok)
    assert bool(jnp.all(jnp.isfinite(E)))


def test_healthy_case_passes_and_recovers():
    rng = np.random.default_rng(1)
    X = rng.uniform([-1, -1, 3], [1, 1, 6], (32, 3))
    R = np.asarray(so3.exp(jnp.array([0.1, 0.05, -0.2])))
    t = np.array([0.5, 0.1, 0.0])
    p1 = X[:, :2] / X[:, 2:]
    Xt = X @ R.T + t
    p2 = Xt[:, :2] / Xt[:, 2:]
    E, ok = ep.essential_8pt(jnp.asarray(p1), jnp.asarray(p2), return_ok=True)
    assert bool(ok)
    Rr, tr, n_good, Xs = ep.recover_pose(E, jnp.asarray(p1), jnp.asarray(p2))
    assert int(n_good) == 32
    assert bool(jnp.all(jnp.isfinite(Xs)))


def test_parallel_rays_finite_and_gated():
    X, d1, d2 = ep.triangulate_midpoint(jnp.eye(3), jnp.zeros(3),
                                        jnp.array([0.1, 0.1]),
                                        jnp.array([0.1, 0.1]))
    assert bool(jnp.all(jnp.isfinite(X)))

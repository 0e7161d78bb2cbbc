"""Iteratively re-gated 8-point estimation with outliers (st2 chi-square loop
semantics) — must recover the clean essential matrix and flag the outliers."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.initialization import robust_fundamental
from slam_tricks_tpu.residuals.epipolar import sampson
from slam_tricks_tpu.sim.two_view import make_two_view

RNG = np.random.default_rng(37)


def test_outliers_rejected():
    """25% gross corruption: the RANSAC-initialized chi-square estimator must
    reject every outlier and keep every clean match."""
    scene = make_two_view(n_points=80, noise=1e-4, seed=6)
    uv1 = np.array(scene.uv1)
    uv2 = np.array(scene.uv2)
    n_out = 20
    idx = RNG.choice(80, n_out, replace=False)
    uv2[idx] += RNG.uniform(0.05, 0.3, size=(n_out, 2)) * RNG.choice([-1, 1], (n_out, 2))

    E, inliers, chi2 = robust_fundamental(
        jnp.asarray(uv1), jnp.asarray(uv2), sigma2=1e-4 ** 2 * 4,
        essential=True)
    inliers = np.asarray(inliers)
    # all corrupted matches excluded; >=90% of clean matches kept
    assert not inliers[idx].any()
    clean = np.setdiff1d(np.arange(80), idx)
    assert inliers[clean].mean() > 0.9

    # recovered E close to the clean-data E (compare by residuals on clean set)
    r = np.asarray(jax.vmap(lambda a, b: sampson(E, a, b))(
        jnp.asarray(uv1[clean]), jnp.asarray(uv2[clean])))
    assert np.sqrt(r.mean()) < 5e-4


def test_no_outliers_keeps_all():
    scene = make_two_view(n_points=40, noise=0.0, seed=7)
    E, inliers, chi2 = robust_fundamental(scene.uv1, scene.uv2,
                                          sigma2=1e-8, essential=True)
    assert np.asarray(inliers).all()

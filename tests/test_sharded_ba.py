"""Distributed BA on the 8-virtual-device CPU mesh: the sharded solve must
match the single-device Schur solve (same algorithm, same Nielsen gain-ratio
control, psum reductions), validating the SURVEY §2.2 parallel design without
hardware."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from slam_tricks_tpu.parallel import make_ba_solver
from slam_tricks_tpu.parallel.partition import (build_local_pairs,
                                                partition_obs_by_landmark)
from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(8), axis_names=("obs",))


def test_sharded_matches_single_device():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"
    scene = make_scene(n_per_wall=10, n_cams=6, seed=21)
    poses0, points0, fixed = perturb_scene(scene, seed=22)

    single = schur.solve_ba(poses0, points0, scene.obs, fixed_mask=fixed,
                            max_iters=25)

    obs = partition_obs_by_landmark(scene.obs, 8)
    pairs = build_local_pairs(obs, 8, dtype=np.float64)
    solver = make_ba_solver(_mesh(), max_iters=25)
    dist = solver(poses0, points0, obs, pairs, fixed)

    assert float(dist.cost) < 1e-18, float(dist.cost)
    # identical LM control law (schur.lm_accept) -> identical trajectory
    assert int(dist.it) == int(single.it), (int(dist.it), int(single.it))
    np.testing.assert_allclose(
        np.asarray(dist.points), np.asarray(single.points), atol=1e-7)


def test_sharded_solver_converges_with_noise():
    scene = make_scene(n_per_wall=10, n_cams=6, pix_noise=1e-3, seed=31)
    poses0, points0, fixed = perturb_scene(scene, seed=32)
    obs = partition_obs_by_landmark(scene.obs, 8)
    pairs = build_local_pairs(obs, 8, dtype=np.float64)
    solver = make_ba_solver(_mesh(), max_iters=30)
    dist = solver(poses0, points0, obs, pairs, fixed)
    n_eff = float(jnp.sum(obs.weight))
    rms = np.sqrt(float(dist.cost) / n_eff)
    assert rms < 2.5e-3, rms

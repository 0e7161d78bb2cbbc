"""Landmark-locality distributed BA: partitioning invariants + solution parity
with the single-device solver on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from slam_tricks_tpu.parallel.landmark_local import (
    make_ba_solver_landmark_local,
    partition_obs_by_landmark,
)
from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur


def test_partition_locality_invariant():
    scene = make_scene(n_per_wall=10, n_cams=6, seed=51)
    obs = partition_obs_by_landmark(scene.obs, 8)
    n = obs.cam_idx.shape[0]
    assert n % 8 == 0
    chunk = n // 8
    lm = np.asarray(obs.lm_idx)
    w = np.asarray(obs.weight)
    seen = {}
    for d in range(8):
        sl = slice(d * chunk, (d + 1) * chunk)
        for l in np.unique(lm[sl][w[sl] > 0]):
            assert l not in seen or seen[l] == d, f"landmark {l} split across devices"
            seen[l] = d
    # no observations lost
    assert w.sum() == np.asarray(scene.obs.weight).sum()


def test_matches_single_device():
    scene = make_scene(n_per_wall=10, n_cams=6, seed=52)
    poses0, points0, fixed = perturb_scene(scene, seed=53)
    obs = partition_obs_by_landmark(scene.obs, 8)

    single = schur.solve_ba(poses0, points0, obs, fixed_mask=fixed, max_iters=25)

    mesh = Mesh(np.array(jax.devices()).reshape(8), axis_names=("obs",))
    solver = make_ba_solver_landmark_local(mesh, max_iters=25)
    dist = solver(poses0, points0, obs, fixed)

    assert float(dist.cost) < 1e-18, float(dist.cost)
    np.testing.assert_allclose(
        np.asarray(dist.points), np.asarray(single.points), atol=1e-6)


def test_noisy_convergence():
    scene = make_scene(n_per_wall=10, n_cams=6, pix_noise=1e-3, seed=54)
    poses0, points0, fixed = perturb_scene(scene, seed=55)
    obs = partition_obs_by_landmark(scene.obs, 8)
    mesh = Mesh(np.array(jax.devices()).reshape(8), axis_names=("obs",))
    solver = make_ba_solver_landmark_local(mesh, max_iters=30)
    out = solver(poses0, points0, obs, fixed)
    rms = np.sqrt(float(out.cost) / float(jnp.sum(obs.weight)))
    assert rms < 2.5e-3, rms

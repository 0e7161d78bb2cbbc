"""Landmark-locality distributed BA: partitioning invariants, solution AND
trajectory parity with the single-device solver on the 8-device CPU mesh, and
the O(N)-memory bound (no (C,L,6,3) tensor — VERDICT r1 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from slam_tricks_tpu.parallel.landmark_local import (
    build_local_pairs,
    make_ba_solver_landmark_local,
    partition_obs_by_landmark,
)
from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(8), axis_names=("obs",))


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


def test_local_pairs_cover_all_tracks():
    """Sum of local pair counts must equal sum_l k_l (k_l + 1) / 2."""
    scene = make_scene(n_per_wall=10, n_cams=6, seed=51)
    obs = partition_obs_by_landmark(scene.obs, 8)
    pairs = build_local_pairs(obs, 8)
    w = np.asarray(obs.weight)
    lm = np.asarray(obs.lm_idx)
    counts = np.bincount(lm[w > 0])
    expected = int(np.sum(counts * (counts + 1) // 2))
    n_real = int(np.sum(np.asarray(pairs.pair_w) > 0))
    assert n_real == expected, (n_real, expected)


def test_matches_single_device():
    scene = make_scene(n_per_wall=10, n_cams=6, seed=52)
    poses0, points0, fixed = perturb_scene(scene, seed=53)

    single = schur.solve_ba(poses0, points0, scene.obs, fixed_mask=fixed,
                            max_iters=25)

    obs = partition_obs_by_landmark(scene.obs, 8)
    pairs = build_local_pairs(obs, 8, dtype=np.float64)
    solver = make_ba_solver_landmark_local(_mesh(), max_iters=25)
    dist = solver(poses0, points0, obs, pairs, fixed)

    assert float(dist.cost) < 1e-18, float(dist.cost)
    # identical LM control law (schur.lm_accept) -> identical trajectory
    assert int(dist.it) == int(single.it), (int(dist.it), int(single.it))
    np.testing.assert_allclose(
        np.asarray(dist.points), np.asarray(single.points), atol=1e-6)


def test_noisy_convergence():
    scene = make_scene(n_per_wall=10, n_cams=6, pix_noise=1e-3, seed=54)
    poses0, points0, fixed = perturb_scene(scene, seed=55)
    obs = partition_obs_by_landmark(scene.obs, 8)
    pairs = build_local_pairs(obs, 8, dtype=np.float64)
    solver = make_ba_solver_landmark_local(_mesh(), max_iters=30)
    out = solver(poses0, points0, obs, pairs, fixed)
    rms = np.sqrt(float(out.cost) / float(jnp.sum(obs.weight)))
    assert rms < 2.5e-3, rms


def test_memory_bound_large_L():
    """At L = 1e5 the compiled distributed step must allocate nowhere near the
    round-1 dense (C,L,6,3) tensor (= C*L*18 elements; here ~14 GB in f64).
    Verified via XLA's compiled memory analysis on the lowered program."""
    rng = np.random.default_rng(0)
    C, L = 64, 100_000
    track = 4
    N = L * track
    from slam_tricks_tpu.sim.ba_scene import BAObservations

    lm_idx = np.repeat(np.arange(L, dtype=np.int64), track)
    cam_idx = rng.integers(0, C, size=N)
    obs = BAObservations(
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        lm_idx=jnp.asarray(lm_idx, jnp.int32),
        uv=jnp.asarray(rng.normal(size=(N, 2)) * 0.3),
        weight=jnp.ones(N))
    obs_p = partition_obs_by_landmark(obs, 8)
    pairs = build_local_pairs(obs_p, 8, dtype=np.float64)

    from slam_tricks_tpu.manifolds import se3
    poses0 = se3.SE3(jnp.tile(jnp.eye(3)[None], (C, 1, 1)),
                     jnp.asarray(rng.normal(size=(C, 3))))
    points0 = jnp.asarray(rng.normal(size=(L, 3)) + np.array([0, 0, 10.0]))
    fixed = jnp.zeros(C, bool).at[0].set(True).at[C - 1].set(True)

    solver = make_ba_solver_landmark_local(_mesh(), max_iters=1)
    lowered = solver.lower(poses0, points0, obs_p, pairs, fixed)
    mem = lowered.compile().memory_analysis()
    dense_w_bytes = C * L * 18 * 8
    budget = dense_w_bytes // 4           # generous: anything close means regress
    total = (mem.temp_size_in_bytes + mem.output_size_in_bytes)
    assert total < budget, (total, dense_w_bytes)

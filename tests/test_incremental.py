"""Incremental smoother (solvers/incremental.py): exactness of the stored-
factor extension, end-to-end equality of the reuse path vs from-scratch
refactorization, and streamed-to-batch optimality."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_tricks_tpu.sim import make_trajectory_scene, perturb_scene
from slam_tricks_tpu.solvers import banded_flat, incremental
from slam_tricks_tpu.solvers.banded_flat import (
    block_tridiag_factor, block_tridiag_factor_extend)


def _rand_spd_tridiag(G, m, seed):
    rng = np.random.default_rng(seed)
    D = rng.normal(size=(G, m, m))
    D = D @ D.transpose(0, 2, 1) + 4 * m * np.eye(m)[None]
    E = 0.1 * rng.normal(size=(G - 1, m, m))
    return jnp.asarray(D), jnp.asarray(E)


def test_factor_extend_exact():
    G, m = 12, 6
    D, E = _rand_spd_tridiag(G, m, 0)
    fac0 = block_tridiag_factor(D, E)

    # perturb only blocks >= g0 (and couplings E[g0-1:]) — the extension
    # contract — then compare the extended factor to a scratch factor
    for g0 in (1, 5, 11):
        D2 = D.at[g0:].add(0.05 * jnp.ones((G - g0, m, m)) @ jnp.eye(m))
        D2 = D2.at[g0:].set(0.5 * (D2[g0:] + jnp.swapaxes(D2[g0:], 1, 2)))
        E2 = E.at[g0 - 1:].add(0.01)
        ref = block_tridiag_factor(D2, E2)
        ext = block_tridiag_factor_extend(fac0, D2, E2, g0)
        np.testing.assert_allclose(np.asarray(ext.L), np.asarray(ref.L),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ext.F), np.asarray(ref.F),
                                   rtol=1e-12, atol=1e-12)

    # degenerate starts: g0 == 0 is a scratch factor, g0 >= G pure reuse
    ref = block_tridiag_factor(D, E)
    ext0 = block_tridiag_factor_extend(fac0, D, E, 0)
    extG = block_tridiag_factor_extend(fac0, D, E, G + 3)
    for ext in (ext0, extG):
        np.testing.assert_allclose(np.asarray(ext.L), np.asarray(ref.L),
                                   rtol=1e-12)


def _stream(scene, poses0, points0, bw, schedule, *, force_scratch=False,
            gn_steps=6):
    state, c_dirty = incremental.smoother_init(
        poses0, points0, bw, n_active=schedule[0])
    for a_prev, a_new in zip(schedule[:-1], schedule[1:]):
        state, c_dirty = incremental.smoother_arrive(
            state, bw, a_prev=a_prev, a_new=a_new,
            c_dirty=0 if force_scratch else c_dirty, gn_steps=gn_steps)
    return state


@pytest.fixture(scope="module")
def traj():
    scene = make_trajectory_scene(n_cams=32, n_points=480, track_len=4,
                                  seed=11, dtype=np.float64)
    poses0, points0, fixed = perturb_scene(scene, seed=12)
    bw = banded_flat.build_banded_work(scene.obs, 32, 480, dtype=np.float64)
    return scene, poses0, points0, bw


def test_reuse_equals_scratch(traj):
    """The incremental factor-reuse stream must match a stream that
    refactors from scratch at every arrival (same restricted updates) —
    the locality contract (prefix super-blocks bit-stable) holds."""
    scene, poses0, points0, bw = traj
    schedule = [16, 20, 24, 28, 32]
    s_reuse = _stream(scene, poses0, points0, bw, schedule)
    s_scratch = _stream(scene, poses0, points0, bw, schedule,
                        force_scratch=True)
    np.testing.assert_allclose(np.asarray(s_reuse.poses.t),
                               np.asarray(s_scratch.poses.t),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_reuse.points_s),
                               np.asarray(s_scratch.points_s),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(s_reuse.cost), float(s_scratch.cost),
                               rtol=1e-10)


def test_stream_reaches_batch(traj):
    """Streaming all cameras then batch-refining from the streamed state
    reaches the same optimum as batch-from-scratch; the streamed estimate
    itself must already be close (tail-restricted GN converges)."""
    scene, poses0, points0, bw = traj
    state = _stream(scene, poses0, points0, bw, [16, 20, 24, 28, 32])
    pts = incremental.scatter_points(state.points_s, bw, 480)

    batch = banded_flat.solve_ba_banded(poses0, points0, bw, max_iters=30)
    warm = banded_flat.solve_ba_banded(state.poses, pts, bw, max_iters=30)
    c_stream, c_batch, c_warm = (float(state.cost), float(batch.cost),
                                 float(warm.cost))
    # the periodic rebatch from the streamed state must reach (here: beat —
    # the stream lands in a better basin than the perturbed batch init)
    # the batch optimum; the anchored stream itself stays within a small
    # factor of it (prefix states are frozen at their arrival-time values)
    assert c_warm <= c_batch * (1 + 1e-6), (c_warm, c_batch)
    assert c_stream <= c_batch * 5.0, (c_stream, c_batch)


def test_active_weight_masks_arrivals(traj):
    scene, poses0, points0, bw = traj
    w_all = incremental.active_weight(bw, 32)
    np.testing.assert_allclose(np.asarray(w_all), np.asarray(bw.weight))
    w_half = np.asarray(incremental.active_weight(bw, 16))
    c0 = np.asarray(incremental.slot_c0(bw))
    K = bw.weight.shape[0]
    cam_of_slot = c0[None, :] + np.arange(K)[:, None]
    assert (w_half[cam_of_slot >= 16] == 0).all()
    np.testing.assert_allclose(w_half[cam_of_slot < 16],
                               np.asarray(bw.weight)[cam_of_slot < 16])

"""Distributed large-C PCG BA (parallel/pcg_dist.py): trajectory parity with
the single-device flat PCG solver on the 8-device CPU mesh, and the collective
traffic bound (no (C,C,6,6) or (L,3) psum anywhere — VERDICT r2 item 5)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from slam_tricks_tpu.parallel.pcg_dist import (
    build_dist_work,
    make_ba_solver_pcg_dist,
    partition_obs_by_landmark,
)
from slam_tricks_tpu.sim import make_scene, make_trajectory_scene, perturb_scene
from slam_tricks_tpu.solvers import schur_flat
from slam_tricks_tpu.solvers.pcg_flat import build_pcg_work


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(8), axis_names=("obs",))


def _single_pcg(scene, poses0, points0, fixed, *, max_iters, cg_iters, cg_tol,
                dtype):
    work = schur_flat.build_flat_work(scene.obs, scene.n_cams, scene.n_points,
                                      dtype=dtype, use_cam_table=True)
    pcgw = build_pcg_work(scene.obs, scene.n_cams, dtype=dtype)
    return schur_flat.solve_ba_flat(
        poses0, points0, scene.obs, work, fixed_mask=fixed,
        max_iters=max_iters, linear="pcg", pcg_work=pcgw, cg_iters=cg_iters,
        cg_tol=cg_tol)


@pytest.mark.slow
def test_matches_single_device_cube():
    dtype = np.float64
    scene = make_scene(n_per_wall=10, n_cams=6, seed=61, pix_noise=1e-3,
                       dtype=dtype)
    poses0, points0, fixed = perturb_scene(scene, seed=62)
    obs_p = partition_obs_by_landmark(scene.obs, 8)
    work = build_dist_work(obs_p, scene.n_cams, scene.n_points, 8, dtype=dtype)

    # trajectory parity at a fixed PRE-convergence iteration count (at the
    # exact-zero optimum, accept/reject flips on last-bit f.p. noise, so
    # comparing `it` after convergence is meaningless)
    kw = dict(max_iters=5, cg_iters=200, cg_tol=1e-12)
    single = _single_pcg(scene, poses0, points0, fixed, dtype=dtype, **kw)
    dist = make_ba_solver_pcg_dist(_mesh(), **kw)(poses0, points0, work, fixed)
    np.testing.assert_allclose(float(dist.cost), float(single.cost),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(dist.poses.t),
                               np.asarray(single.poses.t), atol=1e-9)
    np.testing.assert_allclose(np.asarray(dist.points),
                               np.asarray(single.points), atol=1e-8)

    # and full convergence to the noise-floor optimum
    full = make_ba_solver_pcg_dist(_mesh(), max_iters=25, cg_iters=200,
                                   cg_tol=1e-12)(poses0, points0, work, fixed)
    rms = np.sqrt(float(full.cost) / float(np.sum(np.asarray(scene.obs.weight))))
    assert rms < 2.5e-3, rms


@pytest.mark.slow
def test_matches_single_device_trajectory():
    """The large-C problem shape this path exists for (st20 spiral analog)."""
    dtype = np.float64
    scene = make_trajectory_scene(n_cams=64, n_points=1500, track_len=6,
                                  seed=63, dtype=dtype)
    poses0, points0, fixed = perturb_scene(
        scene, pose_rot_noise=0.002, pose_trans_noise=0.01, point_noise=0.01,
        seed=64)
    # pre-plateau comparison: with EARLY-STOPPED CG the two sides' residual
    # norms differ by reassociation, so CG iteration counts (and hence steps)
    # can differ slightly near convergence — compare mid-trajectory
    kw = dict(max_iters=4, cg_iters=100, cg_tol=1e-10)

    single = _single_pcg(scene, poses0, points0, fixed, dtype=dtype, **kw)

    obs_p = partition_obs_by_landmark(scene.obs, 8)
    work = build_dist_work(obs_p, scene.n_cams, scene.n_points, 8, dtype=dtype)
    dist = make_ba_solver_pcg_dist(_mesh(), **kw)(poses0, points0, work, fixed)

    np.testing.assert_allclose(float(dist.cost), float(single.cost),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dist.poses.t),
                               np.asarray(single.poses.t), atol=1e-5)


def test_collective_traffic_is_pose_sized():
    """The compiled distributed step must not move O(C^2*36) or O(L*3) bytes
    per iteration across devices: check the lowered HLO's collective ops all
    carry pose-sized (O(C)) operands."""
    dtype = np.float32
    scene = make_trajectory_scene(n_cams=32, n_points=2000, track_len=5,
                                  seed=65, dtype=dtype)
    poses0, points0, fixed = perturb_scene(scene, seed=66)
    obs_p = partition_obs_by_landmark(scene.obs, 8)
    work = build_dist_work(obs_p, scene.n_cams, scene.n_points, 8, dtype=dtype)
    solver = make_ba_solver_pcg_dist(_mesh(), max_iters=2, cg_iters=10)
    lowered = solver.lower(poses0, points0, work, fixed)
    C = scene.n_cams
    # every all-reduce operand must be <= the preconditioner's (C,6,6) block
    # array — i.e. pose-sized, never (C,C,6,6) (C^2*36) nor (L,3)
    from tests.hlo_util import all_reduce_operand_sizes

    cap = C * 6 * 6 * 4 * 2   # bytes, x2 slack for fusion/padding
    sizes = all_reduce_operand_sizes(lowered)
    # the solver contains psums (Hpp/gp/cost + CG reductions) — an empty
    # match list means the parser went vacuous, not that there is no traffic
    assert len(sizes) >= 3, f"no all-reduce ops found (vacuous): {sizes}"
    for shape, nbytes in sizes:
        assert nbytes <= cap, f"oversized collective operand: {shape}"


def test_robust_loss_distributed_pcg():
    """Robust IRLS through the distributed PCG solver matches the
    single-device flat-PCG robust solve."""
    from slam_tricks_tpu.residuals import robust

    dtype = np.float64
    scene = make_trajectory_scene(n_cams=24, n_points=500, track_len=4,
                                  seed=67, dtype=dtype)
    poses0, points0, fixed = perturb_scene(scene, seed=68)
    rng = np.random.default_rng(4)
    uv = np.asarray(scene.obs.uv).copy()
    valid = np.flatnonzero(np.asarray(scene.obs.weight) > 0)
    hit = rng.choice(valid, valid.size // 50, replace=False)
    uv[hit] += rng.normal(scale=0.3, size=(hit.size, 2))
    obs_c = scene.obs._replace(uv=jnp.asarray(uv))

    loss = robust.tukey(0.02)
    kw = dict(max_iters=4, cg_iters=150, cg_tol=1e-11)
    work = schur_flat.build_flat_work(obs_c, scene.n_cams, scene.n_points,
                                      dtype=dtype, use_cam_table=True)
    pcgw = build_pcg_work(obs_c, scene.n_cams, dtype=dtype)
    ref = schur_flat.solve_ba_flat(poses0, points0, obs_c, work,
                                   fixed_mask=fixed, linear="pcg",
                                   pcg_work=pcgw, loss=loss, **kw)
    obs_p = partition_obs_by_landmark(obs_c, 8)
    dwork = build_dist_work(obs_p, scene.n_cams, scene.n_points, 8,
                            dtype=dtype)
    dist = make_ba_solver_pcg_dist(_mesh(), loss=loss, **kw)(
        poses0, points0, dwork, fixed)
    np.testing.assert_allclose(float(dist.cost), float(ref.cost), rtol=1e-3)

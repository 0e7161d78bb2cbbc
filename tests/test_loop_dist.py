"""Distributed loop-closure BA (parallel/loop_dist): parity with the
single-device banded+Woodbury solver on the 8-device CPU mesh, and the
collective-volume bound (the Woodbury correction must cost ZERO extra
communication — LC structure is replicated)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from slam_tricks_tpu.parallel.banded_dist import build_dist_banded_work
from slam_tricks_tpu.parallel.loop_dist import (build_dist_loop_work,
                                                make_ba_solver_loop_dist)
from slam_tricks_tpu.sim import make_loop_scene, perturb_scene
from slam_tricks_tpu.solvers import loop_flat


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(8), axis_names=("obs",))


def _problem(dtype=np.float64, n_cams=48, n_points=900, track_len=5,
             seed=89):
    scene = make_loop_scene(n_cams=n_cams, n_points=n_points,
                            track_len=track_len, seed=seed, pix_noise=1e-3,
                            dtype=dtype)
    poses0, points0, fixed = perturb_scene(
        scene, pose_rot_noise=0.002, pose_trans_noise=0.01, point_noise=0.01,
        seed=seed + 1)
    return scene, poses0, points0, fixed


def test_matches_single_device_f64():
    """Tight parity (f64): exact solves both sides, only cross-device f.p.
    reassociation differs."""
    dtype = np.float64
    scene, poses0, points0, fixed = _problem(dtype=dtype)
    lw = loop_flat.build_loop_work(scene.obs, scene.n_cams, scene.n_points,
                                   dtype=dtype, max_band=5)
    ref = loop_flat.solve_ba_loop(poses0, points0, lw, fixed_mask=fixed,
                                  max_iters=6)
    dwork = build_dist_loop_work(scene.obs, scene.n_cams, scene.n_points, 8,
                                 dtype=dtype, max_band=5)
    dist = make_ba_solver_loop_dist(_mesh(), max_iters=6)(
        poses0, points0, dwork, fixed)
    assert int(dist.it) == int(ref.it)
    np.testing.assert_allclose(float(dist.cost), float(ref.cost), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(dist.poses.t),
                               np.asarray(ref.poses.t), atol=1e-8)
    np.testing.assert_allclose(np.asarray(dist.points),
                               np.asarray(ref.points), atol=1e-8)


def test_f32_converges_to_floor():
    """f32 distributed loop solve reaches the same noise floor as the
    single-device solve (trajectory-level parity; bit-parity is bounded by
    the f32 Schur-cancellation analysis in test_banded_dist)."""
    dtype = np.float32
    scene, poses0, points0, fixed = _problem(dtype=dtype, n_cams=64,
                                             n_points=1500, track_len=6,
                                             seed=95)
    lw = loop_flat.build_loop_work(scene.obs, scene.n_cams, scene.n_points,
                                   dtype=dtype, max_band=6)
    ref = loop_flat.solve_ba_loop(poses0, points0, lw, fixed_mask=fixed,
                                  max_iters=20)
    dwork = build_dist_loop_work(scene.obs, scene.n_cams, scene.n_points, 8,
                                 dtype=dtype, max_band=6)
    dist = make_ba_solver_loop_dist(_mesh(), max_iters=20)(
        poses0, points0, dwork, fixed)
    np.testing.assert_allclose(float(dist.cost), float(ref.cost), rtol=0.05)


def test_collectives_no_bigger_than_banded():
    """The Woodbury correction must add ZERO communication: the distributed
    loop solve's all-reduce operand sizes are bounded by the SAME cap as
    the pure banded path (K stacked (C,6,6) bands)."""
    from tests.hlo_util import all_reduce_operand_sizes

    dtype = np.float32
    scene, poses0, points0, fixed = _problem(dtype=dtype, n_cams=32,
                                             n_points=600, track_len=4,
                                             seed=97)
    dwork = build_dist_loop_work(scene.obs, scene.n_cams, scene.n_points, 8,
                                 dtype=dtype, max_band=4)
    solver = make_ba_solver_loop_dist(_mesh(), max_iters=2)
    lowered = solver.lower(poses0, points0, dwork, fixed)
    C = scene.n_cams
    K = int(dwork.banded_local.weight.shape[1])
    cap = K * C * 36 * 4 * 2
    sizes = all_reduce_operand_sizes(lowered)
    assert len(sizes) >= 3, f"no all-reduce ops found (vacuous): {sizes}"
    for shape, nbytes in sizes:
        assert nbytes <= cap, f"oversized collective operand: {shape}"

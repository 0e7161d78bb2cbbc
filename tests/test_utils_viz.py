"""Utility-layer tests: viz exports, CSV/corner-file IO round trips, config
dataclasses, logger, RANSAC iterative refit."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.config import BAConfig, RansacConfig, SolverConfig, from_dict, to_dict
from slam_tricks_tpu.initialization.ransac import ransac_iterative_refit
from slam_tricks_tpu.residuals import simple
from slam_tricks_tpu.utils.io import board_model_points, read_cbcorners, write_cbcorners
from slam_tricks_tpu.utils.logging import get_logger, log_var
from slam_tricks_tpu.viz import hessian_sparsity_image, plot_ba_scene, plot_trajectories, save_csv

RNG = np.random.default_rng(43)


def test_hessian_sparsity_image():
    img = hessian_sparsity_image(2, 3, [0, 0, 1], [0, 2, 1])
    D = 2 * 6 + 3 * 3
    assert img.shape == (D, D)
    # camera diag blocks set
    assert img[:6, :6].all() and img[6:12, 6:12].all()
    # cam0-lm0 off-diag block set, cam1-lm0 not
    assert img[0:6, 12:15].all()
    assert not img[6:12, 12:15].any()
    # symmetry
    np.testing.assert_array_equal(img, img.T)


def test_plots_and_csv(tmp_path):
    from slam_tricks_tpu.sim import make_scene

    scene = make_scene(n_per_wall=4, n_cams=4)
    p1 = plot_ba_scene(str(tmp_path / "scene.png"), scene.poses_true, scene.points_true)
    p2 = plot_trajectories(str(tmp_path / "traj.png"), {"gt": scene.poses_true})
    p3 = save_csv(str(tmp_path / "pts.csv"), ["x", "y", "z"],
                  np.asarray(scene.points_true)[:5])
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 0


def test_cbcorner_roundtrip(tmp_path):
    corners = RNG.uniform(0, 100, (5 * 8, 2))
    path = str(tmp_path / "c.txt")
    write_cbcorners(path, 5, 8, corners)
    r, c, back = read_cbcorners(path)
    assert (r, c) == (5, 8)
    np.testing.assert_allclose(back, corners, atol=1e-3)
    board = board_model_points(5, 8, 0.028)
    assert board.shape == (40, 2)
    assert abs(board[1, 0] - 0.028) < 1e-12  # row-major: second point is next column


def test_config_roundtrip():
    cfg = SolverConfig(max_iters=7).replace(lambda_init=1e-3)
    d = to_dict(cfg)
    cfg2 = from_dict(SolverConfig, d)
    assert cfg2 == cfg
    assert BAConfig().max_iters == 30
    assert RansacConfig().n_hyps == 256


def test_logger_levels(capsys):
    log = get_logger("test-logger", color=False)
    log.info("hello")
    log.process("working %d", 42)
    log_var(log, x=1, y="z")
    err = capsys.readouterr().err
    assert "hello" in err and "working 42" in err and "x = 1" in err


def test_ransac_iterative_refit():
    xs = jnp.asarray(RNG.uniform(-3, 3, 200))
    clean = xs ** 2 + 2 * xs + 3
    outlier = RNG.random(200) < 0.3
    ys = jnp.where(jnp.asarray(outlier), clean + jnp.asarray(RNG.uniform(5, 30, 200)), clean)
    res = ransac_iterative_refit(
        jax.random.PRNGKey(1), {"x": xs, "y": ys},
        min_fit=lambda d: simple.parabola_fit_lsq(d["x"], d["y"]),
        residual_sq=lambda p, d: simple.parabola_residual(p, d["x"], d["y"]) ** 2,
        refit=lambda d, w: simple.parabola_fit_lsq(d["x"], d["y"], w),
        subset_size=3, n_hyps=128, inlier_thresh_sq=0.01, n_refine=5)
    np.testing.assert_allclose(np.asarray(res.params), [1, 2, 3], atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from slam_tricks_tpu.solvers.schur import BAState
    from slam_tricks_tpu.manifolds import se3
    from slam_tricks_tpu.utils.checkpoint import load_pytree, save_pytree

    state = BAState(
        poses=se3.SE3(jnp.tile(jnp.eye(3), (4, 1, 1)), jnp.ones((4, 3))),
        points=jnp.arange(15.0).reshape(5, 3),
        cost=jnp.asarray(0.5), lam=jnp.asarray(1e-4), nu=jnp.asarray(2.0),
        it=jnp.asarray(7, jnp.int32), done=jnp.asarray(False))
    path = save_pytree(str(tmp_path / "state.npz"), state)
    back = load_pytree(path, state)
    assert int(back.it) == 7 and float(back.cost) == 0.5
    np.testing.assert_array_equal(np.asarray(back.points), np.asarray(state.points))
    np.testing.assert_array_equal(np.asarray(back.poses.t), np.asarray(state.poses.t))


def test_checkpoint_rejects_mismatched_structure(tmp_path):
    import pytest
    from slam_tricks_tpu.utils.checkpoint import load_pytree, save_pytree

    tree = {"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
    path = save_pytree(str(tmp_path / "t.npz"), tree)
    # different treedef -> raises (silent leaf mis-assignment guard)
    with pytest.raises(ValueError, match="structure mismatch"):
        load_pytree(path, {"x": jnp.ones((3,)), "y": jnp.zeros((2, 2))})
    # same treedef, different leaf shape -> raises
    with pytest.raises(ValueError, match="shape"):
        load_pytree(path, {"a": jnp.ones((4,)), "b": jnp.zeros((2, 2))})

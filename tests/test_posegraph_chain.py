"""Large-scale pose-graph solver (solvers/posegraph.solve_pose_graph_chain):
block-tridiagonal odometry chain + rank-6-per-loop-edge Woodbury.

Parity vs the dense solve_pose_graph at small N; convergence and
loop-closure drift correction at the g2o-benchmark scale the dense
(N,N,6,6) path cannot reach (VERDICT r3 item 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slam_tricks_tpu.manifolds import se3
from slam_tricks_tpu.solvers.posegraph import (build_chain_work,
                                               solve_pose_graph,
                                               solve_pose_graph_chain)


def make_graph(N, n_loops, seed=0, dtype=np.float64, odo_noise=0.01,
               loop_noise=0.001):
    """Circle trajectory, odometry chain + long-range loop edges; initial
    guess integrates the noisy odometry (accumulating drift)."""
    rng = np.random.default_rng(seed)
    ang = 2 * np.pi * np.arange(N) / N
    t_true = np.stack([10 * np.cos(ang), 10 * np.sin(ang),
                       0.1 * np.sin(3 * ang)], 1)
    Rt = np.stack([np.array([[np.cos(a), -np.sin(a), 0],
                             [np.sin(a), np.cos(a), 0],
                             [0, 0, 1]]) for a in ang])
    poses_true = se3.SE3(jnp.asarray(Rt.astype(dtype)),
                         jnp.asarray(t_true.astype(dtype)))
    ii = list(range(N - 1))
    jj = list(range(1, N))
    li = rng.integers(0, N // 4, n_loops)
    lj = rng.integers(3 * N // 4, N, n_loops)
    ii += li.tolist()
    jj += lj.tolist()
    ii = np.array(ii)
    jj = np.array(jj)
    Ti = jax.tree_util.tree_map(lambda a: a[ii], poses_true)
    Tj = jax.tree_util.tree_map(lambda a: a[jj], poses_true)
    Zc = jax.vmap(lambda a, b: se3.mul(se3.inv(a), b))(Ti, Tj)
    scale = np.where(np.arange(len(ii)) < N - 1, odo_noise, loop_noise)
    xi = rng.normal(size=(len(ii), 6)) * scale[:, None]
    Z = jax.vmap(lambda T, x: se3.mul(T, se3.exp(x)))(
        Zc, jnp.asarray(xi.astype(dtype)))
    info = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (len(ii), 6, 6))
    R0, t0 = [Rt[0]], [t_true[0]]
    Zr = np.asarray(Z.R)
    Zt = np.asarray(Z.t)
    for k in range(N - 1):
        R0.append(R0[-1] @ Zr[k])
        t0.append(R0[-2] @ Zt[k] + t0[-1])
    poses0 = se3.SE3(jnp.asarray(np.stack(R0).astype(dtype)),
                     jnp.asarray(np.stack(t0).astype(dtype)))
    return poses_true, poses0, jnp.asarray(ii), jnp.asarray(jj), Z, info


def test_parity_vs_dense():
    dtype = np.float64
    N = 60
    _, poses0, ii, jj, Z, info = make_graph(N, 6, seed=3, dtype=dtype)
    fixed = jnp.zeros(N, bool).at[0].set(True)
    it = 8
    ref = solve_pose_graph(poses0, ii, jj, Z, info, fixed_mask=fixed,
                           max_iters=it)
    work = build_chain_work(ii, jj, Z, info, N, dtype=dtype)
    out = solve_pose_graph_chain(poses0, work, fixed_mask=fixed,
                                 max_iters=it)
    assert int(out.it) == int(ref.it)
    np.testing.assert_allclose(float(out.cost), float(ref.cost), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(out.poses.t),
                               np.asarray(ref.poses.t), atol=1e-6)


def test_loop_closures_fix_drift():
    """Odometry-only drift vs loop-closed: the loop-closed solution's ATE
    must be far smaller."""
    dtype = np.float64
    N = 400
    poses_true, poses0, ii, jj, Z, info = make_graph(N, 20, seed=7,
                                                     dtype=dtype)
    fixed = jnp.zeros(N, bool).at[0].set(True)
    work = build_chain_work(ii, jj, Z, info, N, dtype=dtype)
    out = solve_pose_graph_chain(poses0, work, fixed_mask=fixed,
                                 max_iters=30)
    t_true = np.asarray(poses_true.t)
    err0 = np.sqrt(np.mean((np.asarray(poses0.t) - t_true) ** 2))
    err = np.sqrt(np.mean((np.asarray(out.poses.t) - t_true) ** 2))
    assert err < 0.2 * err0, (err, err0)


@pytest.mark.slow
def test_f32_10k_poses():
    """The scale target: a 10k-pose graph (the dense path would need a
    (60000, 60000) Cholesky). f32 inputs auto-upcast to f64 internally —
    chain conditioning passes 1/eps32 near N ~ 600."""
    dtype = np.float32
    N = 10_000
    poses_true, poses0, ii, jj, Z, info = make_graph(N, 64, seed=11,
                                                     dtype=dtype,
                                                     odo_noise=0.002,
                                                     loop_noise=0.0005)
    fixed = jnp.zeros(N, bool).at[0].set(True)
    work = build_chain_work(ii, jj, Z, info, N, dtype=dtype)
    out = solve_pose_graph_chain(poses0, work, fixed_mask=fixed,
                                 max_iters=25)
    assert np.isfinite(float(out.cost))
    t_true = np.asarray(poses_true.t)
    err0 = np.sqrt(np.mean((np.asarray(poses0.t) - t_true) ** 2))
    err = np.sqrt(np.mean((np.asarray(out.poses.t) - t_true) ** 2))
    assert err < 0.25 * err0, (err, err0)


def test_no_loop_edges():
    """A pure chain (zero loop edges) must work — U is all-padding."""
    dtype = np.float64
    N = 50
    _, poses0, ii, jj, Z, info = make_graph(N, 0, seed=13, dtype=dtype)
    assert ii.shape[0] == N - 1
    fixed = jnp.zeros(N, bool).at[0].set(True)
    ref = solve_pose_graph(poses0, ii, jj, Z, info, fixed_mask=fixed,
                           max_iters=8)
    work = build_chain_work(ii, jj, Z, info, N, dtype=dtype)
    out = solve_pose_graph_chain(poses0, work, fixed_mask=fixed, max_iters=8)
    np.testing.assert_allclose(float(out.cost), float(ref.cost), rtol=1e-8)


def test_relative_parity_vs_dense():
    """solve_pose_graph_relative reaches the dense solver's optimum (the
    LM trajectories differ — damping acts in relative coordinates — so
    parity is at the converged cost, not per-iteration)."""
    pt, p0, ii, jj, Z, info = make_graph(60, 6, seed=0)
    out_d = solve_pose_graph(p0, ii, jj, Z, info, max_iters=30)
    work = build_chain_work(ii, jj, Z, info, 60)
    from slam_tricks_tpu.solvers.posegraph import solve_pose_graph_relative
    out_r = solve_pose_graph_relative(p0, work, max_iters=30)
    np.testing.assert_allclose(float(out_r.cost), float(out_d.cost),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_r.poses.t),
                               np.asarray(out_d.poses.t), atol=1e-3)


@pytest.mark.slow
def test_relative_f32_matches_f64_chain_at_n2048():
    """The f32-NATIVE large-N path (VERDICT r4 item 3): at N=2048 — far
    beyond the N~600 where the absolute-state formulation loses all f32
    progress — the relative-state solver in pure f32 must reach the f64
    chain solver's optimum."""
    import jax.numpy as jnp

    from slam_tricks_tpu.solvers.posegraph import solve_pose_graph_relative

    N = 2048
    pt, p0, ii, jj, Z, info = make_graph(N, 16, seed=1)
    work64 = build_chain_work(ii, jj, Z, info, N, dtype=np.float64)
    out64 = solve_pose_graph_chain(p0, work64, max_iters=20)
    f32 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    work32 = build_chain_work(ii, jj, Z, info, N, dtype=np.float32)
    out32 = solve_pose_graph_relative(f32(p0), work32, max_iters=20)
    np.testing.assert_allclose(float(out32.cost), float(out64.cost),
                               rtol=1e-2)
    ate64 = float(jnp.sqrt(jnp.mean((out64.poses.t - pt.t) ** 2)))
    ate32 = float(jnp.sqrt(jnp.mean(
        (out32.poses.t.astype(jnp.float64) - pt.t) ** 2)))
    assert abs(ate32 - ate64) < 0.01 * max(ate64, 0.01)

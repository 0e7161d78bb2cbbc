"""Sim(3) manifold + scale-drift-aware pose-graph optimization.

Manifold golden tests: W = phi1(sigma I + hat(omega)) against a 6x6
block-expm oracle (exact: expm([[M, I], [0, 0]]) has phi1(M) in its top-right
block), exp/log roundtrips across both singular regimes (theta -> 0,
sigma -> 0) in f64 AND f32 (the branch-free scaling-and-squaring evaluation
must not need dtype-tuned thresholds), group axioms, adjoint identity.

Solver test: the Strasdat RSS-2010 result — monocular odometry with
accumulated scale drift closes a loop; Sim(3) pose-graph optimization
recovers metric-consistent scale, while the same graph's SE(3) projection
structurally cannot (scale is not in its state).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import scipy.linalg as sla

from slam_tricks_tpu.manifolds import se3, sim3, so3
from slam_tricks_tpu.solvers.posegraph import solve_pose_graph
from slam_tricks_tpu.solvers.posegraph_sim3 import solve_pose_graph_sim3

# both singular directions and their overlap, plus generic points
THETAS = [0.0, 1e-9, 1e-6, 1e-4, 1e-2, 0.2, 1.0, 3.0, np.pi - 1e-3]
SIGMAS = [0.0, 1e-9, -1e-6, 1e-4, -1e-2, 0.2, -0.5, 2.0, -5.0]


def test_W_vs_block_expm_oracle():
    rng = np.random.default_rng(0)
    worst = 0.0
    for th in THETAS:
        for sg in SIGMAS:
            ax = rng.normal(size=3)
            ax /= np.linalg.norm(ax)
            w = jnp.asarray(th * ax)
            M = sg * np.eye(3) + np.asarray(so3.hat(w))
            blk = np.zeros((6, 6))
            blk[:3, :3] = M
            blk[:3, 3:] = np.eye(3)
            Wref = sla.expm(blk)[:3, 3:]
            Wme = np.asarray(sim3._W(w, jnp.asarray(float(sg))))
            worst = max(worst, np.abs(Wme - Wref).max() / max(np.abs(Wref).max(), 1.0))
    assert worst < 1e-11


def test_exp_log_roundtrip_f64():
    rng = np.random.default_rng(1)
    for th in THETAS:
        for sg in SIGMAS:
            ax = rng.normal(size=3)
            ax /= np.linalg.norm(ax)
            xi = jnp.asarray(np.concatenate(
                [rng.normal(size=3) * 2.0, th * ax, [sg]]))
            xi2 = sim3.log(sim3.exp(xi))
            np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi),
                                       rtol=1e-9, atol=1e-10)


def test_exp_f32_matches_f64_without_thresholds():
    """The scaling-and-squaring evaluation is uniformly accurate in f32 —
    including the regimes where closed-form coefficients cancel (the f32
    failure mode manifolds/_coeffs.py:_cancel_thr documents for SE(3))."""
    rng = np.random.default_rng(2)
    for th in THETAS:
        for sg in SIGMAS:
            ax = rng.normal(size=3)
            ax /= np.linalg.norm(ax)
            xi = np.concatenate([rng.normal(size=3), th * ax, [sg]])
            S32 = sim3.exp(jnp.asarray(xi, jnp.float32))
            S64 = sim3.exp(jnp.asarray(xi, jnp.float64))
            tref = np.asarray(S64.t)
            terr = np.abs(np.asarray(S32.t, np.float64) - tref).max()
            assert terr <= 3e-5 * max(1.0, np.abs(tref).max())
            assert np.abs(float(S32.s) - float(S64.s)) <= 1e-4 * float(S64.s)


def test_group_axioms_and_matrix_homomorphism():
    ka, kb = jax.random.split(jax.random.PRNGKey(3))
    Sa = sim3.random(ka, jnp.float64)
    Sb = sim3.random(kb, jnp.float64)
    Mab = np.asarray(sim3.to_matrix(sim3.mul(Sa, Sb)))
    np.testing.assert_allclose(
        Mab, np.asarray(sim3.to_matrix(Sa)) @ np.asarray(sim3.to_matrix(Sb)),
        atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(sim3.to_matrix(sim3.inv(Sa))) @ np.asarray(sim3.to_matrix(Sa)),
        np.eye(4), atol=1e-12)
    # act == matrix action
    p = jnp.asarray(np.random.default_rng(4).normal(size=3))
    ph = np.append(np.asarray(p), 1.0)
    np.testing.assert_allclose(np.asarray(sim3.act(Sa, p)),
                               (np.asarray(sim3.to_matrix(Sa)) @ ph)[:3],
                               atol=1e-12)
    # from_matrix roundtrip
    S2 = sim3.from_matrix(sim3.to_matrix(Sa))
    np.testing.assert_allclose(float(S2.s), float(Sa.s), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(S2.R), np.asarray(Sa.R), atol=1e-12)


def test_adjoint_identity():
    """log(S exp(xi) S^-1) = Adj(S) xi (first order; exact for one-parameter
    subgroups — checked at small xi)."""
    S = sim3.random(jax.random.PRNGKey(5), jnp.float64)
    xi = jnp.asarray(np.random.default_rng(6).normal(size=7) * 1e-5)
    lhs = sim3.log(sim3.mul(sim3.mul(S, sim3.exp(xi)), sim3.inv(S)))
    rhs = sim3.adj(S) @ xi
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-7, atol=1e-14)


def test_reduces_to_se3_at_unit_scale():
    """sigma = 0 slice: exp/log agree with the SE(3) module (W -> Jl)."""
    rng = np.random.default_rng(7)
    for _ in range(10):
        xi6 = rng.normal(size=6)
        xi7 = jnp.asarray(np.concatenate([xi6, [0.0]]))
        S = sim3.exp(xi7)
        T = se3.exp(jnp.asarray(xi6))
        np.testing.assert_allclose(np.asarray(S.R), np.asarray(T.R), atol=1e-12)
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(T.t), atol=1e-12)
        assert abs(float(S.s) - 1.0) < 1e-14


def _mono_loop_graph(N=96, n_loops=6, ds=0.004, odo_noise=1e-3, seed=0,
                     dtype=np.float64):
    """Realistic mono-VO model. Each keyframe i carries an unknown local map
    scale p_i (deterministic drift e^{-ds*i}); the ground-truth Sim(3)
    trajectory is S_i = (R_i, t_i, p_i) over true metric poses (R_i, t_i).
    Odometry measures S_i^-1 S_{i+1} (translation expressed in the drifting
    local units — the mono situation) with noise on all 7 tangent axes; loop
    closures measure S_i^-1 S_j exactly (map alignment observes the
    accumulated scale ratio p_j/p_i — how drift is detected in practice).
    Initial guess integrates the noisy odometry. Returns
    (t_true metric positions, p true scale profile, poses0, edges...)."""
    rng = np.random.default_rng(seed)
    ang = 2 * np.pi * np.arange(N) / N
    t_true = np.stack([10 * np.cos(ang), 10 * np.sin(ang),
                       0.1 * np.sin(3 * ang)], 1)
    Rt = np.stack([np.array([[np.cos(a), -np.sin(a), 0],
                             [np.sin(a), np.cos(a), 0],
                             [0, 0, 1]]) for a in ang])
    p = np.exp(-ds * np.arange(N))
    gt = sim3.Sim3(jnp.asarray(Rt.astype(dtype)),
                   jnp.asarray(t_true.astype(dtype)),
                   jnp.asarray(p.astype(dtype)))
    ii = list(range(N - 1))
    jj = list(range(1, N))
    li = rng.integers(0, N // 4, n_loops)
    lj = rng.integers(3 * N // 4, N, n_loops)
    ii += li.tolist()
    jj += lj.tolist()
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    E = len(ii)
    Si = jax.tree_util.tree_map(lambda a: a[ii], gt)
    Sj = jax.tree_util.tree_map(lambda a: a[jj], gt)
    Zc = jax.vmap(lambda a, b: sim3.mul(sim3.inv(a), b))(Si, Sj)
    is_odo = np.arange(E) < N - 1
    xi = rng.normal(size=(E, 7)) * odo_noise
    xi[~is_odo] = 0.0  # loop measurements exact
    Z = jax.vmap(lambda S, x: sim3.mul(S, sim3.exp(x)))(
        Zc, jnp.asarray(xi.astype(dtype)))
    info = np.broadcast_to(np.eye(7, dtype=dtype), (E, 7, 7)).copy()
    info[~is_odo] *= 10.0
    # initial guess: what an UNCORRECTED mono system has — keyframe poses
    # integrated from the odometry's (R, t) with no scale compensation
    # (s = 1), so the drift-stretched local translations spiral the
    # trajectory away from the true circle (s_0 = p_0 = 1 anchors the
    # similarity gauge at the first pose)
    Rz, tz = np.asarray(Z.R, np.float64), np.asarray(Z.t, np.float64)
    R0, t0 = [Rt[0]], [t_true[0]]
    for k in range(N - 1):
        t0.append(R0[-1] @ tz[k] + t0[-1])
        R0.append(R0[-1] @ Rz[k])
    poses0 = sim3.Sim3(jnp.asarray(np.stack(R0).astype(dtype)),
                       jnp.asarray(np.stack(t0).astype(dtype)),
                       jnp.ones(N, dtype=dtype))
    return t_true, p, poses0, jnp.asarray(ii), jnp.asarray(jj), Z, jnp.asarray(info)


def _ate(t_est, t_true):
    return float(np.sqrt(np.mean(np.sum(
        (np.asarray(t_est) - np.asarray(t_true)) ** 2, 1))))


def test_scale_drift_corrected_by_sim3_pgo():
    t_true, p, poses0, ii, jj, Z, info = _mono_loop_graph()
    ate0 = _ate(poses0.t, t_true)
    assert ate0 > 0.5  # the drifted/noisy init is visibly off
    out = solve_pose_graph_sim3(poses0, ii, jj, Z, info, max_iters=50)
    ate1 = _ate(out.poses.t, t_true)
    # metric positions recovered AND the latent scale profile identified
    assert ate1 < 0.1 * ate0, (ate0, ate1)
    s_rel_err = np.abs(np.asarray(out.poses.s) / p - 1.0).max()
    assert s_rel_err < 0.02, s_rel_err


def test_se3_pgo_cannot_fix_scale():
    """Control: hand the same graph to the SE(3) solver (it consumes the
    rotation/translation of every measurement; scale is not in its state).
    The drift-stretched odometry translations are inconsistent with the
    exact loop closures in SE(3), so its compromise keeps an ATE an order of
    magnitude above the Sim(3) solve on identical data — the Strasdat
    RSS-2010 motivation, measured."""
    t_true, p, poses0, ii, jj, Z, info = _mono_loop_graph()
    out7 = solve_pose_graph_sim3(poses0, ii, jj, Z, info, max_iters=50)
    out6 = solve_pose_graph(se3.SE3(poses0.R, poses0.t), ii, jj,
                            se3.SE3(Z.R, Z.t),
                            jnp.asarray(np.asarray(info)[:, :6, :6]),
                            max_iters=50)
    ate7 = _ate(out7.poses.t, t_true)
    ate6 = _ate(out6.poses.t, t_true)
    assert ate6 > 10 * ate7, (ate6, ate7)


def test_sim3_pgo_f32():
    """The solver is f32-clean at essential-graph scale (the mono keyframe
    regime, ~100 keyframes)."""
    t_true, p, poses0, ii, jj, Z, info = _mono_loop_graph(dtype=np.float32)
    out = solve_pose_graph_sim3(poses0, ii, jj, Z, info, max_iters=50)
    s_rel_err = np.abs(np.asarray(out.poses.s) / p - 1.0).max()
    assert s_rel_err < 0.06, s_rel_err
    assert _ate(out.poses.t, t_true) < 0.2 * _ate(poses0.t, t_true)

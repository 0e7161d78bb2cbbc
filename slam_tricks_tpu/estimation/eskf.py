"""Error-state Kalman filter on SE(3) — the filter st4 intended but never
implemented (reference: st4-kalman/src/include/solver.h is an empty header
guard, solver.cpp is 0 lines; theory only in docs/kalman.pdf). Built here as a
proper right-invariant-style ESKF over the st4 simulation setup (noisy pose
observations of a smooth trajectory, pose_simulation.cpp:17-88).

State: T in SE(3) with 6x6 tangent covariance P (right perturbation
T_true = T_est * exp(delta), delta ~ N(0, P), ordering [rho, omega]).

- predict with relative odometry Z (+ process noise Q):
    T <- T Z,   P <- Adj(Z^-1) P Adj(Z^-1)^T + Q
- update with absolute pose observation T_obs (+ noise R):
    y = log(T^-1 T_obs),  S = P + R,  K = P S^-1,
    T <- T exp(K y),      P <- (I - K) P (I - K)^T + K R K^T   (Joseph form)

`filter_trajectory` lax.scans the whole sequence in one compiled program.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tricks_tpu.manifolds import se3


class ESKFState(NamedTuple):
    T: se3.SE3
    P: jnp.ndarray  # (6,6)


def predict(state, Z, Q):
    """Propagate through relative motion Z with process noise Q (6,6)."""
    Ad = se3.adj(se3.inv(Z))
    return ESKFState(T=se3.mul(state.T, Z), P=Ad @ state.P @ Ad.T + Q)


def update_pose(state, T_obs, R_cov):
    """Absolute-pose measurement update (Joseph-stabilized)."""
    y = se3.log(se3.mul(se3.inv(state.T), T_obs))
    S = state.P + R_cov
    K = jnp.linalg.solve(S.T, state.P.T).T  # P S^-1
    delta = K @ y
    T_new = se3.mul(state.T, se3.exp(delta))
    I = jnp.eye(6, dtype=state.P.dtype)
    IK = I - K
    P_new = IK @ state.P @ IK.T + K @ R_cov @ K.T
    return ESKFState(T=T_new, P=P_new)


def filter_trajectory(T0, P0, odometry, observations, obs_mask, Q, R_cov):
    """Scan predict/update over a sequence.

    odometry: stacked SE3 (N,) relative motions; observations: stacked SE3 (N,)
    absolute poses; obs_mask (N,) bool — False steps skip the update (the
    masked-update pattern keeps shapes static). Returns stacked filtered poses
    and final state."""

    def step(state, inp):
        Z, T_obs, m = inp
        state = predict(state, Z, Q)
        updated = update_pose(state, T_obs, R_cov)
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(m, a, b), updated, state)
        return state, state.T

    init = ESKFState(T=T0, P=P0)
    final, Ts = jax.lax.scan(step, init, (odometry, observations, obs_mask))
    return Ts, final

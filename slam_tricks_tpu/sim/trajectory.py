"""Pose-trajectory simulators: spiral-on-sphere SE(3) path with compounding
odometry noise (reference: st4-kalman/src/src/pose_simulation.cpp:17-88) and
pose-graph edge generation (odometry chain + loop closures) for the pose-graph
solver config.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.manifolds import se3


def spiral_poses(n=60, radius=3.0, turns=2.0, height=2.0, dtype=np.float64):
    """Deterministic spiral trajectory of T_wb body poses (the st4 shape)."""
    Rs, ts = [], []
    for i in range(n):
        s = i / max(n - 1, 1)
        ang = 2 * np.pi * turns * s
        pos = np.array([radius * np.cos(ang), radius * np.sin(ang), height * s])
        # heading along the tangent
        fwd = np.array([-np.sin(ang), np.cos(ang), height / (2 * np.pi * turns * radius)])
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        left = np.cross(up, fwd)
        left /= np.linalg.norm(left)
        up2 = np.cross(fwd, left)
        R = np.stack([fwd, left, up2], axis=1)
        Rs.append(R)
        ts.append(pos)
    return se3.SE3(jnp.asarray(np.stack(Rs).astype(dtype)),
                   jnp.asarray(np.stack(ts).astype(dtype)))


class PoseGraphProblem(NamedTuple):
    poses_true: se3.SE3
    poses_init: se3.SE3
    i_idx: jnp.ndarray
    j_idx: jnp.ndarray
    Z: se3.SE3           # stacked measurements (E,)
    fixed_mask: jnp.ndarray


def make_pose_graph(n=40, odo_noise=0.01, loop_every=8, meas_noise=0.005,
                    seed=0, dtype=np.float64):
    """Odometry chain with compounding noise (the reference's incremental noise
    compounding, pose_simulation.cpp:73-79) + noisy loop-closure edges.

    Initialization integrates the NOISY odometry (drift grows along the chain);
    loop closures make the optimum pull it back to the truth."""
    rng = np.random.default_rng(seed)
    truth = spiral_poses(n, dtype=dtype)

    def noise6(scale):
        return jnp.asarray((rng.normal(size=6) * scale).astype(dtype))

    # edges: consecutive odometry + loop closures
    i_list, j_list, Z_list = [], [], []
    for k in range(n - 1):
        Ti = jax.tree_util.tree_map(lambda a: a[k], truth)
        Tj = jax.tree_util.tree_map(lambda a: a[k + 1], truth)
        Zk = se3.mul(se3.inv(Ti), Tj)
        Z_list.append(se3.mul(Zk, se3.exp(noise6(meas_noise))))
        i_list.append(k)
        j_list.append(k + 1)
    for k in range(0, n - loop_every, loop_every):
        j = min(k + loop_every, n - 1)
        Ti = jax.tree_util.tree_map(lambda a: a[k], truth)
        Tj = jax.tree_util.tree_map(lambda a: a[j], truth)
        Zk = se3.mul(se3.inv(Ti), Tj)
        Z_list.append(se3.mul(Zk, se3.exp(noise6(meas_noise))))
        i_list.append(k)
        j_list.append(j)

    # init: integrate odometry with extra drift noise
    init = [jax.tree_util.tree_map(lambda a: a[0], truth)]
    for k in range(n - 1):
        Zk = Z_list[k]
        drift = se3.exp(noise6(odo_noise))
        init.append(se3.mul(se3.mul(init[-1], Zk), drift))
    poses_init = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *init)
    Z = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *Z_list)
    fixed = jnp.zeros(n, bool).at[0].set(True)
    return PoseGraphProblem(
        poses_true=truth, poses_init=poses_init,
        i_idx=jnp.asarray(i_list, jnp.int32), j_idx=jnp.asarray(j_list, jnp.int32),
        Z=Z, fixed_mask=fixed)

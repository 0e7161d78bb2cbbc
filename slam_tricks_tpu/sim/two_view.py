"""Two-view scene simulator (reference: st22-two-view/src/src/two_view_simu.cpp:
2 cameras + random landmarks, projections with bounds culling)."""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from slam_tricks_tpu.manifolds import se3
from slam_tricks_tpu.sim.ba_scene import look_at


class TwoViewScene(NamedTuple):
    T1: se3.SE3           # T_cw of camera 1
    T2: se3.SE3
    points: jnp.ndarray   # (N,3) world
    uv1: jnp.ndarray      # (N,2) normalized-plane obs in cam 1
    uv2: jnp.ndarray
    T_12: se3.SE3         # relative pose: T2 * inv(T1) maps cam1 coords -> cam2


def make_two_view(n_points=100, baseline=1.0, noise=0.0, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n_points, 3))
    R1, t1 = look_at(np.array([0.0, 0.0, 0.0]), np.array([0.0, 0.0, 6.0]),
                     up=np.array([0.0, 1.0, 0.0]))
    R2, t2 = look_at(np.array([baseline, 0.15, 0.1]), np.array([0.0, 0.0, 6.0]),
                     up=np.array([0.0, 1.0, 0.0]))
    T1 = se3.SE3(jnp.asarray(R1.astype(dtype)), jnp.asarray(t1.astype(dtype)))
    T2 = se3.SE3(jnp.asarray(R2.astype(dtype)), jnp.asarray(t2.astype(dtype)))
    p = jnp.asarray(pts.astype(dtype))
    pc1 = se3.act(T1, p)
    pc2 = se3.act(T2, p)
    uv1 = pc1[:, :2] / pc1[:, 2:]
    uv2 = pc2[:, :2] / pc2[:, 2:]
    if noise > 0:
        uv1 = uv1 + jnp.asarray(rng.normal(size=uv1.shape).astype(dtype)) * noise
        uv2 = uv2 + jnp.asarray(rng.normal(size=uv2.shape).astype(dtype)) * noise
    T_12 = se3.mul(T2, se3.inv(T1))
    return TwoViewScene(T1=T1, T2=T2, points=p, uv1=uv1, uv2=uv2, T_12=T_12)

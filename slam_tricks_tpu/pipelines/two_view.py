"""Two-view reconstruction pipeline: essential-matrix init -> pose recovery ->
triangulation -> joint LM refinement.

The BASELINE "st22 two-view" config, mirroring the reference flow
(st22-two-view/src/main.cpp:8-40: 8-point F -> E -> 4-way decomposition with
all-pairs cheirality -> DLT triangulation -> (no refinement in reference; we
add the joint bundle refinement the reference leaves to st20)).

TPU-native: the whole pipeline is one jittable function; triangulation and
refinement are the vmapped/Schur machinery of the solver layer.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tricks_tpu.initialization import essential_8pt, recover_pose
from slam_tricks_tpu.manifolds import se3
from slam_tricks_tpu.sim.ba_scene import BAObservations
from slam_tricks_tpu.solvers import schur


class TwoViewResult(NamedTuple):
    T_12: se3.SE3          # recovered relative pose (cam1 -> cam2), |t| = 1 gauge
    points: jnp.ndarray    # (N,3) triangulated in cam-1 frame
    final_cost: jnp.ndarray
    n_cheiral: jnp.ndarray


def solve_two_view(uv1, uv2, *, refine_iters=20, weights=None):
    """uv1/uv2: (N,2) normalized-plane correspondences. Returns TwoViewResult.

    Scale gauge: ||t|| = 1 (the reference instead rescales to ground truth,
    st22 main.cpp:21-27 — equivalent up to the monocular scale ambiguity).
    """
    dtype = uv1.dtype
    n = uv1.shape[0]
    E = essential_8pt(uv1, uv2, weights)
    R, t, n_good, X = recover_pose(E, uv1, uv2, weights)
    T12_init = se3.SE3(R, t)

    # joint refinement as a 2-camera bundle adjustment: camera1 fixed at
    # identity (gauge), camera2 free; landmarks = triangulated points.
    poses0 = se3.SE3(
        jnp.stack([jnp.eye(3, dtype=dtype), R]),
        jnp.stack([jnp.zeros(3, dtype=dtype), t]),
    )
    cam_idx = jnp.concatenate([jnp.zeros(n, jnp.int32), jnp.ones(n, jnp.int32)])
    lm_idx = jnp.concatenate([jnp.arange(n, dtype=jnp.int32)] * 2)
    uv = jnp.concatenate([uv1, uv2], axis=0)
    w = jnp.ones(2 * n, dtype) if weights is None else jnp.concatenate([weights, weights])
    # guard badly-triangulated points (behind camera / near-infinite)
    depth_ok = (X[:, 2] > 1e-3) & jnp.all(jnp.isfinite(X), axis=1)
    X_safe = jnp.where(depth_ok[:, None], X, jnp.ones_like(X))
    w = w * jnp.concatenate([depth_ok, depth_ok]).astype(dtype)

    obs = BAObservations(cam_idx=cam_idx, lm_idx=lm_idx, uv=uv, weight=w)
    # fix camera 1 only; the scale gauge is pinned after the solve by
    # renormalizing ||t|| (cheaper than a constrained solve and exactly the
    # monocular similarity freedom)
    fixed = jnp.array([True, False])
    final = schur.solve_ba(poses0, X_safe, obs, fixed_mask=fixed,
                           max_iters=refine_iters)
    T2 = jax.tree_util.tree_map(lambda a: a[1], final.poses)
    scale = jnp.linalg.norm(T2.t)
    T_12 = se3.SE3(T2.R, T2.t / scale)
    points = final.points / scale
    return TwoViewResult(T_12=T_12, points=points, final_cost=final.cost,
                         n_cheiral=n_good)

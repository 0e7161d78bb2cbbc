"""Multi-view triangulation: batched N-view DLT + per-landmark GN refinement.

Covers the reference's per-landmark Ceres triangulation refinement in the BA
simulation (st20-g2o/src/src/sim_data.cpp:298-311, Triangulation functor
sim_data.h:165-194) and generalizes st22's two-view DLT
(two_view_geometry.cpp:103-126) to arbitrary track lengths.

Static shapes: tracks are padded to a fixed max length V with a weight mask.
"""

import jax
import jax.numpy as jnp

from slam_tricks_tpu.manifolds import se3


def triangulate_nview_dlt(poses, uv, weights):
    """One landmark from V views (padded): poses = stacked SE3 (V,) T_cw,
    uv (V,2) normalized-plane observations, weights (V,) with 0 = padding.
    Returns (X (3,), residual_rms)."""
    # rows: hat-constraint pairs per view: u*(r3.X + t3) - (r1.X + t1) = 0 etc.
    R, t = poses.R, poses.t
    u, v = uv[:, 0], uv[:, 1]
    w = weights
    # A X = b with A (2V,3), b (2V,)
    A1 = u[:, None] * R[:, 2, :] - R[:, 0, :]
    A2 = v[:, None] * R[:, 2, :] - R[:, 1, :]
    b1 = t[:, 0] - u * t[:, 2]
    b2 = t[:, 1] - v * t[:, 2]
    A = jnp.concatenate([A1 * w[:, None], A2 * w[:, None]], axis=0)
    b = jnp.concatenate([b1 * w, b2 * w])
    AtA = A.T @ A
    Atb = A.T @ b
    X = jnp.linalg.solve(AtA + 1e-12 * jnp.eye(3, dtype=A.dtype), Atb)
    # residual rms over active views
    pc = jnp.einsum("vij,j->vi", R, X) + t
    pred = pc[:, :2] / pc[:, 2:]
    r2 = jnp.sum((pred - uv) ** 2, axis=1) * w
    rms = jnp.sqrt(jnp.sum(r2) / jnp.maximum(jnp.sum(w), 1.0))
    return X, rms


def refine_point_gn(poses, uv, weights, X0, iters=5):
    """Per-landmark GN on the reprojection cost (the st20 per-landmark Ceres
    refinement role). Returns refined X (3,)."""

    def body(_, X):
        pc = jnp.einsum("vij,j->vi", poses.R, X) + poses.t
        z = jnp.maximum(pc[:, 2], 1e-6)
        pred = pc[:, :2] / z[:, None]
        r = (pred - uv) * weights[:, None]
        iz = 1.0 / z
        head = jnp.stack([
            jnp.stack([iz, jnp.zeros_like(iz), -pc[:, 0] * iz * iz], axis=1),
            jnp.stack([jnp.zeros_like(iz), iz, -pc[:, 1] * iz * iz], axis=1),
        ], axis=1)  # (V,2,3)
        J = jnp.einsum("vri,vij->vrj", head, poses.R) * weights[:, None, None]
        H = jnp.einsum("vri,vrj->ij", J, J)
        g = jnp.einsum("vri,vr->i", J, r)
        delta = jnp.linalg.solve(H + 1e-10 * jnp.eye(3, dtype=X.dtype), -g)
        return X + delta

    return jax.lax.fori_loop(0, iters, body, X0)


def triangulate_tracks(poses_all, cam_idx_padded, uv_padded, w_padded,
                       refine_iters=5):
    """Batched: L landmarks with padded tracks.

    poses_all: stacked SE3 (C,); cam_idx_padded (L,V) int; uv_padded (L,V,2);
    w_padded (L,V). Returns (X (L,3), rms (L,))."""

    def one(cams, uv, w):
        P = jax.tree_util.tree_map(lambda a: a[cams], poses_all)
        X0, _ = triangulate_nview_dlt(P, uv, w)
        X = refine_point_gn(P, uv, w, X0, refine_iters)
        pc = jnp.einsum("vij,j->vi", P.R, X) + P.t
        pred = pc[:, :2] / jnp.maximum(pc[:, 2:], 1e-6)
        r2 = jnp.sum((pred - uv) ** 2, axis=1) * w
        rms = jnp.sqrt(jnp.sum(r2) / jnp.maximum(jnp.sum(w), 1.0))
        return X, rms

    return jax.vmap(one)(cam_idx_padded, uv_padded, w_padded)


def tracks_from_obs(obs, n_points, max_track=None):
    """Host-side: convert flat observation arrays into padded per-landmark
    tracks (L, V) for `triangulate_tracks`."""
    import numpy as np

    cam_idx = np.asarray(obs.cam_idx)
    lm_idx = np.asarray(obs.lm_idx)
    uv = np.asarray(obs.uv)
    w = np.asarray(obs.weight)
    active = w > 0
    lengths = np.bincount(lm_idx[active], minlength=n_points)
    V = int(lengths.max()) if max_track is None else max_track
    cams = np.zeros((n_points, V), np.int32)
    uvs = np.zeros((n_points, V, 2), uv.dtype)
    ws = np.zeros((n_points, V), w.dtype)
    fill = np.zeros(n_points, np.int32)
    for n in np.nonzero(active)[0]:
        l = lm_idx[n]
        k = fill[l]
        if k < V:
            cams[l, k] = cam_idx[n]
            uvs[l, k] = uv[n]
            ws[l, k] = w[n]
            fill[l] = k + 1
    return jnp.asarray(cams), jnp.asarray(uvs), jnp.asarray(ws)

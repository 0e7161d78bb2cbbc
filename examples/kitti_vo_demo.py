"""End-to-end monocular visual odometry on the reference's real KITTI frames
(st13-directmethod/img/000000-000005.png) — the real-data validation culture
of the reference (SURVEY §4) applied to the flagship BA path:

    LK feature tracking  ->  two-view initialization (8-point + refinement)
    ->  PnP chaining      ->  full multi-frame bundle adjustment (flat Schur)
    ->  reprojection statistics + trajectory artifact

The st13 frames ship no ground-truth poses, so the quantitative gate is the
final reprojection RMS (the reference's own validation metric class, e.g.
st2-epipolar main.cpp:127-151) plus motion sanity (dominant forward motion,
small inter-frame rotation — the car drives straight in this clip).

Intrinsics: standard KITTI odometry grayscale camera (P0 of the devkit),
fx = fy = 718.856, cx = 607.1928, cy = 185.2157.

Run: python examples/kitti_vo_demo.py [--frames DIR] [--plot out.png]
"""

import argparse
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

FX = FY = 718.856
CX, CY = 607.1928, 185.2157


def load_frames(frame_dir):
    import cv2

    frames = []
    for name in sorted(os.listdir(frame_dir)):
        if name.endswith(".png"):
            img = cv2.imread(os.path.join(frame_dir, name), cv2.IMREAD_GRAYSCALE)
            frames.append(img.astype(np.float32) / 255.0)
    return frames


def track_sequence(frames):
    """LK-chain grid-seeded features through the whole clip. Returns
    (uv_px (F, M, 2), alive (F, M) bool) — a feature stays in the table while
    tracking succeeds in every frame (full-length tracks only)."""
    from slam_tricks_tpu.frontend.optical_flow import (grid_seed_points,
                                                       lk_track)

    h, w = frames[0].shape
    pts0 = grid_seed_points(h, w, grid=12, pts_per_cell=2, margin=20, seed=0)
    uv = [np.asarray(pts0)]
    alive = [np.ones(pts0.shape[0], bool)]
    cur = jnp.asarray(pts0)
    for k in range(1, len(frames)):
        nxt, ok = lk_track(jnp.asarray(frames[k - 1]), jnp.asarray(frames[k]),
                           cur, levels=3, win=9, iters=12)
        okn = np.asarray(ok) & np.isfinite(np.asarray(nxt)).all(axis=1)
        inb = ((np.asarray(nxt)[:, 0] > 5) & (np.asarray(nxt)[:, 0] < w - 5)
               & (np.asarray(nxt)[:, 1] > 5) & (np.asarray(nxt)[:, 1] < h - 5))
        alive.append(alive[-1] & okn & inb)
        uv.append(np.asarray(nxt))
        cur = nxt
    return np.stack(uv), np.stack(alive)


def _project_all(poses, points, obs):
    R = np.asarray(poses.R)[np.asarray(obs.cam_idx)]
    t = np.asarray(poses.t)[np.asarray(obs.cam_idx)]
    p = np.asarray(points)[np.asarray(obs.lm_idx)]
    pc = np.einsum("nij,nj->ni", R, p) + t
    return pc[:, :2] / np.maximum(pc[:, 2:3], 1e-6)


def normalized(uv_px):
    return np.stack([(uv_px[..., 0] - CX) / FX, (uv_px[..., 1] - CY) / FY],
                    axis=-1)


def main(frame_dir, plot_path=None):
    from slam_tricks_tpu.manifolds import se3
    from slam_tricks_tpu.pipelines.two_view import solve_two_view
    from slam_tricks_tpu.sim.ba_scene import BAObservations
    from slam_tricks_tpu.solvers import schur_flat
    from slam_tricks_tpu.solvers.lm import levenberg_marquardt
    from slam_tricks_tpu.manifolds import lie
    from slam_tricks_tpu.residuals.reprojection import reproject_normalized

    frames = load_frames(frame_dir)
    F = len(frames)
    print(f"[kitti-vo] {F} frames {frames[0].shape}")

    uv_px, alive = track_sequence(frames)
    full = alive[-1]                       # tracks alive through all frames
    # minimum parallax gate: static points break monocular init
    par = np.linalg.norm(uv_px[-1] - uv_px[0], axis=1)
    keep = full & (par > 2.0)
    uv_px = uv_px[:, keep]
    M = uv_px.shape[1]
    print(f"[kitti-vo] {M} full-length tracks (of {full.shape[0]} seeds)")
    uvn = normalized(uv_px).astype(np.float32)

    # ---- outlier gate: robust essential-matrix RANSAC + chi2 loop on the
    # widest baseline (the st2 epipolar machinery, epipolar.hpp:139-209) ----
    from slam_tricks_tpu.initialization.robust_epipolar import robust_fundamental
    _, inl, _ = robust_fundamental(jnp.asarray(uvn[0]), jnp.asarray(uvn[-1]),
                                   sigma2=(1.5 / FX) ** 2, essential=True)
    inl = np.asarray(inl)
    print(f"[kitti-vo] epipolar inliers {int(inl.sum())}/{M}")
    uv_px = uv_px[:, inl]
    uvn = uvn[:, inl]
    M = uv_px.shape[1]

    # ---- two-view init on the widest baseline (frame 0 -> last) ----
    tv = solve_two_view(jnp.asarray(uvn[0]), jnp.asarray(uvn[-1]),
                        refine_iters=30)
    print(f"[kitti-vo] two-view: cheirality {int(tv.n_cheiral)}/{M}, "
          f"cost {float(tv.final_cost):.3e}")
    X0 = np.asarray(tv.points)             # landmarks in frame-0 camera frame

    # ---- chain intermediate poses by motion-only LM (PnP) on X0 ----
    dtype = np.float32
    poses_R = [np.eye(3, dtype=dtype)]
    poses_t = [np.zeros(3, dtype=dtype)]
    good = (X0[:, 2] > 0.5) & np.isfinite(X0).all(axis=1)
    for k in range(1, F):
        frac = k / (F - 1)
        T_last = se3.SE3(jnp.asarray(tv.T_12.R), jnp.asarray(tv.T_12.t))
        xi = frac * np.asarray(se3.log(T_last))
        T0_k = se3.exp(jnp.asarray(xi.astype(dtype)))

        w = jnp.asarray(good.astype(dtype))

        def resid(T, uv_k=jnp.asarray(uvn[k]), w=w):
            r = jax.vmap(lambda p, uv: reproject_normalized(T, p, uv))(
                jnp.asarray(X0.astype(dtype)), uv_k)
            return r * w[:, None]

        res = levenberg_marquardt(resid, T0_k, lie(se3), max_iters=15)
        poses_R.append(np.asarray(res.x.R))
        poses_t.append(np.asarray(res.x.t))
    print("[kitti-vo] PnP chaining done")

    # ---- full-sequence BA (flat Schur path) ----
    cam_idx = np.repeat(np.arange(F), M).astype(np.int32)
    lm_idx = np.tile(np.arange(M), F).astype(np.int32)
    uv_all = uvn.reshape(F * M, 2)
    w_all = np.tile(good.astype(dtype), F)
    pad = (-len(cam_idx)) % 8
    obs = BAObservations(
        cam_idx=jnp.asarray(np.concatenate([cam_idx, np.zeros(pad, np.int32)])),
        lm_idx=jnp.asarray(np.concatenate([lm_idx, np.zeros(pad, np.int32)])),
        uv=jnp.asarray(np.concatenate([uv_all, np.zeros((pad, 2), dtype)])),
        weight=jnp.asarray(np.concatenate([w_all, np.zeros(pad, dtype)])))
    poses0 = se3.SE3(jnp.asarray(np.stack(poses_R)),
                     jnp.asarray(np.stack(poses_t)))
    points0 = jnp.asarray(X0.astype(dtype))
    fixed = jnp.zeros(F, bool).at[0].set(True)

    work = schur_flat.build_flat_work(obs, F, M, dtype=dtype)
    out = schur_flat.solve_ba_flat(poses0, points0, obs, work,
                                   fixed_mask=fixed, max_iters=40)

    # trim pass: drop tracks whose residual stays far beyond the bulk
    # (LK drift / moving objects), then re-solve — the two-pass trimming the
    # reference's chi2 loop applies per-iteration (st2 epipolar.hpp:139-209)
    for round_ in range(2):
        r = np.asarray(obs.uv) - _project_all(out.poses, out.points, obs)
        valid = np.asarray(obs.weight) > 0
        pe = np.sqrt((r ** 2).sum(axis=1)) * valid
        per_track = np.zeros(M)
        cnt = np.zeros(M)
        np.add.at(per_track, np.asarray(obs.lm_idx), pe)
        np.add.at(cnt, np.asarray(obs.lm_idx), valid.astype(float))
        per_track /= np.maximum(cnt, 1)
        med = np.median(per_track[cnt > 0])
        bad_track = (per_track > (4 - round_) * med) & (cnt > 0)
        if not bad_track.any():
            break
        w_new = np.asarray(obs.weight) * (~bad_track)[np.asarray(obs.lm_idx)]
        obs = obs._replace(weight=jnp.asarray(w_new.astype(dtype)))
        print(f"[kitti-vo] round {round_}: trimmed {int(bad_track.sum())} "
              f"outlier tracks (median {med * FX:.2f} px)")
        work = schur_flat.build_flat_work(obs, F, M, dtype=dtype)
        out = schur_flat.solve_ba_flat(out.poses, out.points, obs, work,
                                       fixed_mask=fixed, max_iters=30)
    n_eff = float(jnp.sum(obs.weight))
    rms_n = np.sqrt(float(out.cost) / n_eff)
    rms_px = rms_n * FX
    print(f"[kitti-vo] BA: {int(out.it)} iters, reprojection RMS "
          f"{rms_px:.3f} px ({rms_n:.2e} normalized)")

    # motion sanity: camera centers c = -R^T t, forward = +z in camera frame
    R_f = np.asarray(out.poses.R)
    t_f = np.asarray(out.poses.t)
    centers = -np.einsum("fji,fj->fi", R_f, t_f)
    step = np.diff(centers, axis=0)
    fwd_frac = np.abs(step[:, 2]).sum() / (np.linalg.norm(step, axis=1).sum() + 1e-12)
    rot_deg = [np.degrees(np.arccos(np.clip((np.trace(R_f[k]) - 1) / 2, -1, 1)))
               for k in range(F)]
    print(f"[kitti-vo] forward-motion fraction {fwd_frac:.2f}, "
          f"max |rot| {max(rot_deg):.2f} deg")

    if plot_path:
        from slam_tricks_tpu.viz.plots import plot_ba_scene
        plot_ba_scene(plot_path, out.poses, np.asarray(out.points),
                      title="KITTI st13 clip: VO + BA")
        print(f"[kitti-vo] wrote {plot_path}")
    return rms_px, fwd_frac, max(rot_deg)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", default="/root/reference/st13-directmethod/img")
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()
    main(args.frames, args.plot)

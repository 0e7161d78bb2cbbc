"""Large-scale trajectory BA demo — the sliding-window/odometry problem shape
at scales the reference never reaches (st20's scene is ~30 cams; this one
defaults to C=512 cameras / 50k landmarks / 400k observations).

Runs the slot-major banded-direct solver (exact linear solves, zero large
gathers — solvers/banded_flat.py), robustified with a Huber loss against
injected outliers, then extracts marginal pose covariances from the same
banded factorization (Takahashi recursion) and reports ATE.

Run:  python examples/trajectory_ba_demo.py [--cpu] [--cams 512]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--cams", type=int, default=512)
    ap.add_argument("--points", type=int, default=50_000)
    ap.add_argument("--track", type=int, default=8)
    ap.add_argument("--outliers", type=float, default=0.02)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from slam_tricks_tpu.evaluation.metrics import ate_translation_rmse
    from slam_tricks_tpu.residuals import robust
    from slam_tricks_tpu.sim import make_trajectory_scene, perturb_scene
    from slam_tricks_tpu.solvers import banded_flat

    dtype = np.float32
    print(f"scene: C={args.cams} L={args.points} track={args.track}")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        scene = make_trajectory_scene(n_cams=args.cams, n_points=args.points,
                                      track_len=args.track, seed=0,
                                      dtype=dtype)
        poses0, points0, fixed = perturb_scene(
            scene, pose_rot_noise=0.002, pose_trans_noise=0.01,
            point_noise=0.01, seed=1)
        # inject gross outliers (the robust-loss reason to exist)
        rng = np.random.default_rng(2)
        uv = np.asarray(scene.obs.uv).copy()
        valid = np.flatnonzero(np.asarray(scene.obs.weight) > 0)
        n_out = int(args.outliers * valid.size)
        hit = rng.choice(valid, n_out, replace=False)
        uv[hit] += rng.normal(scale=0.3, size=(n_out, 2))
        obs = scene.obs._replace(uv=jnp.asarray(uv))
        bw = banded_flat.build_banded_work(obs, scene.n_cams, scene.n_points,
                                           dtype=dtype)
    dev = jax.devices()[0]
    poses0, points0, fixed, bw = jax.device_put(
        (poses0, points0, fixed, bw), dev)

    # redescending loss: gross outliers get ZERO influence (Huber's linear
    # tail still lets 2%-rate outliers drag weakly-constrained mid-trajectory
    # poses — measured ATE 0.12 vs 0.003 on this scene)
    loss = robust.tukey(0.02)
    solve = jax.jit(lambda p, x, b, f: banded_flat.solve_ba_banded(
        p, x, b, fixed_mask=f, max_iters=20, loss=loss))
    t0 = time.perf_counter()
    out = solve(poses0, points0, bw, fixed)
    cost = float(out.cost)
    dt = time.perf_counter() - t0
    it = int(out.it)
    print(f"solved: {it} LM iterations in {dt:.2f}s "
          f"({dt * 1e3 / max(it, 1):.1f} ms/iter incl. compile), "
          f"robust cost {cost:.3e}")

    truth = jax.device_put(scene.poses_true, dev)
    ate0 = float(ate_translation_rmse(poses0, truth))
    ate1 = float(ate_translation_rmse(out.poses, truth))
    print(f"ATE RMSE: {ate0:.4f} -> {ate1:.6f}")

    # lam is RELATIVE Marquardt damping; 1e-3 (~0.1% information inflation)
    # keeps Tukey-zeroed (rank-deficient) landmark blocks invertible in f32
    cov = banded_flat.banded_pose_covariances(out.poses, out.points, bw,
                                              fixed,
                                              lam=1e-3, loss=loss)
    # S^-1 assumes unit measurement variance (the Ceres convention);
    # scale by the estimated measurement sigma from the robust residuals
    n_eff = float(jnp.sum(bw.weight))
    sig_meas = float(jnp.sqrt(2.0 * out.cost / jnp.maximum(n_eff, 1.0)))
    sig = sig_meas * np.sqrt(np.maximum(np.asarray(
        jnp.diagonal(cov, axis1=-2, axis2=-1)), 0.0))
    mid = args.cams // 2
    print(f"estimated measurement sigma: {sig_meas:.2e} (normalized units)")
    print(f"pose sigma (camera {mid}): rot {sig[mid, :3].max():.2e} rad, "
          f"trans {sig[mid, 3:].max():.2e} (first/last cameras are gauge)")


if __name__ == "__main__":
    main()

"""Visual-inertial smoothing demo — the application of st23's preintegration
theory (st23-lie-group-v2/doc.tex:132-1148, theory-only in the reference).

Simulates an analytic trajectory with a noisy IMU stream and noisy keyframe
pose observations, preintegrates every segment in one vmapped scan, and runs
three estimators:

  1. dead-reckoning (raw integration at a wrong bias guess)   -> diverges
  2. the dense VI MAP smoother (poses+velocities+shared bias) -> beats the
     raw observations and recovers the bias
  3. visual-inertial BA from a 0.7x-mis-scaled initialization -> recovers
     METRIC SCALE (a monocular BA keeps the wrong scale forever: scale is a
     gauge freedom of reprojection, broken only by the accelerometer)

Run:  python examples/vi_smoother_demo.py [--cpu]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def t_rmse(poses_a, poses_b):
    from slam_tricks_tpu.evaluation.metrics import ate_translation_rmse
    return float(ate_translation_rmse(poses_a, poses_b))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--keyframes", type=int, default=20)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from slam_tricks_tpu.estimation import vi_smoother as vis
    from slam_tricks_tpu.manifolds import se3

    dtype = jnp.float32
    sim = vis.simulate_vi(n_keyframes=args.keyframes, samples_per_seg=100,
                          dt=0.005, sigma_g=2e-4, sigma_a=2e-3,
                          obs_rot_noise=0.005, obs_trans_noise=0.01,
                          seed=3, dtype=dtype)
    bias0 = jnp.zeros(6, dtype)   # wrong: true bias is nonzero
    pre = vis.preintegrate_segments(sim, bias0[:3], bias0[3:],
                                    sigma_g=2e-4, sigma_a=2e-3)

    T0 = jax.tree.map(lambda a: a[0], sim.obs_poses)
    poses_dr, vels_dr = vis.dead_reckon(pre, T0, sim.vels_true[0],
                                        bias0[:3], bias0[3:])
    print(f"dead-reckoning ATE (wrong bias): "
          f"{t_rmse(poses_dr, sim.poses_true):.4f} m")
    print(f"raw pose-observation ATE:        "
          f"{t_rmse(sim.obs_poses, sim.poses_true):.4f} m")

    sol = vis.solve_vi_smoother(pre, sim.obs_poses, poses_dr, vels_dr, bias0,
                                obs_rot_sigma=0.005, obs_trans_sigma=0.01)
    bias_true = np.concatenate([np.array(sim.bg_true), np.array(sim.ba_true)])
    print(f"VI smoother ATE:                 "
          f"{t_rmse(sol.poses, sim.poses_true):.4f} m  "
          f"({int(sol.iterations)} LM iters)")
    print(f"bias error: {np.linalg.norm(bias_true):.4f} -> "
          f"{np.linalg.norm(np.array(sol.bias) - bias_true):.4f}")

    # --- metric-scale recovery with visual landmarks ---
    points, uv, w = vis.simulate_vi_landmarks(sim, n_landmarks=80,
                                              uv_noise=5e-4, seed=2)
    s0 = 0.7
    c = sim.poses_true.t[0]
    poses_scaled = se3.SE3(sim.poses_true.R, c + s0 * (sim.poses_true.t - c))
    solba, pts = vis.solve_vi_ba(pre, uv, w, poses_scaled,
                                 s0 * sim.vels_true, bias0,
                                 c + s0 * (points - c),
                                 pose0_prior=jax.tree.map(lambda a: a[0],
                                                          sim.poses_true))
    d_est = np.linalg.norm(np.diff(np.array(solba.poses.t), axis=0), axis=1)
    d_true = np.linalg.norm(np.diff(np.array(sim.poses_true.t), axis=0),
                            axis=1)
    print(f"VI-BA: scale initialized at {s0:.2f}x -> recovered "
          f"{float((d_est / d_true).mean()):.3f}x metric")

    # --- closed-form bootstrap (no optimization at all) ---
    from slam_tricks_tpu.estimation.vi_init import vi_initialize
    init = vi_initialize(pre, poses_scaled)
    g = np.array(init.gravity)
    print(f"vi_initialize (one lstsq): scale {float(init.scale) * s0:.3f}x, "
          f"gravity [{g[0]:.2f} {g[1]:.2f} {g[2]:.2f}]")


if __name__ == "__main__":
    main()
